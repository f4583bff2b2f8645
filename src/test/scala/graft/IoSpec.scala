package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Io
import java.nio.file.{Files, Paths}

/** Source/sink surface (SURVEY.md §2.1): glob scans with provenance and
  * the single-file CSV sink round-trip. */
class IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType)))

  test("readCsvGlob scans submission-style files with file provenance (S10)") {
    val dir = Files.createTempDirectory("graft_glob").toString
    Files.writeString(Paths.get(dir, "submission_a.csv"), "id,score\n1,0.9\n2,0.8\n")
    Files.writeString(Paths.get(dir, "submission_b.csv"), "id,score\n1,0.7\n")
    Files.writeString(Paths.get(dir, "other.txt"), "ignored\n")
    val df = Io.readCsvGlob(spark, s"$dir/submission*.csv", schema)
    assert(df.count() == 3)
    val files = df.select("source_file").distinct().collect()
      .map(_.getString(0).split('/').last).sorted
    assert(files.toSeq == Seq("submission_a.csv", "submission_b.csv"))
    // per-file aggregation — the evaluate_all_submissions.py shape
    val perFile = df.groupBy("source_file").agg(avg("score").as("mean_score"))
      .collect().map(r => r.getString(0).split('/').last -> r.getDouble(1)).toMap
    assert(math.abs(perFile("submission_a.csv") - 0.85) < 1e-12)
  }

  test("writeSingleCsv produces one readable file (S7)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv").toString + "/sub.csv"
    Io.writeSingleCsv(Seq((1L, 0.25), (2L, 0.75)).toDF("id", "score"), out)
    assert(Files.exists(Paths.get(out)))
    val back = Io.readCsv(spark, out, schema).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back.map(_.getDouble(1)).toSeq == Seq(0.25, 0.75))
  }
}
