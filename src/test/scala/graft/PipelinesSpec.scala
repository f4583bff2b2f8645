package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.{Etl, Experiment, Tournament}

/** End-to-end runs of the reference's three entry points at sf0.001 —
  * the same mains the driver can invoke, kept green by `sbt test`. */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("EP1 etl writes imputed stratified splits") {
    val out = tmp("ep1")
    val result = Etl.run(spark, sfDir, out)
    assert(result.count() > 0)
    val train = spark.read.parquet(s"$out/train.parquet")
    val test = spark.read.parquet(s"$out/test.parquet")
    assert(train.count() > test.count() && test.count() > 0)
    // imputation left no nulls in the cleaned value column
    assert(train.filter(col("v").isNull).count() == 0)
    assert(train.columns.contains("label") && !train.columns.contains("mostly_null"))
  }

  test("EP2 experiment produces a best-config relation incl. the stack") {
    val out = tmp("ep2")
    val best = Experiment.run(spark, sfDir, out).collect()
    assert(best.nonEmpty)
    assert(best.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(spark.read.json(s"$out/results_store").count() == 3)
  }

  test("EP3 tournament emits CV summary and significance comparisons") {
    val out = tmp("ep3")
    val comparisons = Tournament.run(spark, sfDir, out)
    assert(comparisons.count() == 3) // best vs each of the 3 others
    val summary = spark.read.option("header", "true").csv(s"$out/cv_summary.csv")
    assert(summary.count() == 4)
    assert(comparisons.columns.contains("stars"))
  }
}
