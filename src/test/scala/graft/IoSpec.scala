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

  test("partitioned parquet write gives readers partition pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    val df = (1L to 300L).map(i => (i, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    Io.writeParquetPartitioned(df, dir, Seq("source"))
    val back = spark.read.parquet(dir).filter(col("source") === "src1")
    assert(back.count() == 100)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src1"),
      s"source filter should prune partitions:\n${plan.take(1200)}")
    // the partition filter must NOT appear as a data filter (no row IO
    // spent re-checking what the directory layout already guarantees)
    assert(!plan.split("PushedFilters")(1).split("\n")(0).contains("source"),
      "partition key leaked into the data-filter pushdown")
  }

  test("ORC sink/source round-trips with pushdown intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = (1L to 500L).map(i => (i, i * 1.5, s"name$i")).toDF("id", "v", "name")
    Io.writeOrc(df, dir)
    val back = Io.readOrc(spark, dir)
    assert(back.schema.map(_.name) == Seq("id", "v", "name"))
    assert(back.count() == 500)
    assert(back.agg(sum("id")).head.getLong(0) == 500L * 501 / 2)
    val plan = back.filter(col("id") > 400).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,400)"),
      s"ORC scan lost filter pushdown:\n${plan.take(800)}")
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

  test("xlsx round-trip: write → read preserves cells incl. markup + 한글 (S3/S8)") {
    import spark.implicits._
    import graft.io.Xlsx
    val out = Files.createTempDirectory("graft_xlsx").toString + "/codebook.xlsx"
    val src = Seq(
      ("age", "numeric", "", "0"),
      ("smokes", "category", "1:yes | 8:비해당 | 9:모름", "0"),
      ("note", "object", "a<b & \"c\">d", "1"),
      ("gap", "numeric", null, "0")).toDF(
      "variable", "data_type", "option_description", "drop_col")
    Xlsx.write(src, out)
    val back = Xlsx.read(spark, out)
    assert(back.columns.toSeq ==
      Seq("variable", "data_type", "option_description", "drop_col"))
    val rows = back.orderBy("variable").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("age", ""), ("gap", null), ("note", "a<b & \"c\">d"),
      ("smokes", "1:yes | 8:비해당 | 9:모름")))
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z9") == 25 &&
      Xlsx.colIndex("AA3") == 26 && Xlsx.colRef(27) == "AB")
  }

  test("the EP1 codebook path runs off a real xlsx artifact (S3 → M8/P10)") {
    import spark.implicits._
    import graft.io.Xlsx
    import graft.meta.Codebook
    val out = Files.createTempDirectory("graft_xlsx2").toString + "/meta.xlsx"
    Xlsx.write(Seq(
      ("age", "numeric", "", "0"),
      ("smokes", "category", "1:yes | 2:no | 8:비해당 | 9:모름", "0"),
      ("weight_var", "numeric", "", "1")).toDF(
      "variable", "data_type", "option_description", "drop_col"), out)
    val vars = Codebook.fromDataFrame(Xlsx.read(spark, out))
    val smokes = vars.find(_.name == "smokes").get
    assert(smokes.naCodes == Seq(8.0) && smokes.dkCodes == Seq(9.0))
    assert(vars.find(_.name == "weight_var").get.drop)
    val data = Seq((30.0, 1.0, 7.0), (40.0, 8.0, 7.0), (50.0, 9.0, 7.0))
      .toDF("age", "smokes", "weight_var")
    val cleaned = Codebook.applyCleaning(data, vars)
    assert(!cleaned.columns.contains("weight_var"))
    val smokesVals = cleaned.select("smokes").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(smokesVals.toSeq == Seq(Some(1.0), Some(-1.0), None))
  }

  test("compactParquet collapses a small-file table without changing its rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 32 deliberately tiny files (the streaming-sink accumulation shape)
    (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .repartition(32).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val (nBefore, nAfter) = graft.io.Io.compactParquet(spark, dir,
      targetBytes = 512L * 1024)
    assert(nBefore == 32)
    assert(nAfter < nBefore, s"expected fewer files, got $nAfter")
    val afterRows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterRows == beforeRows)
    // a partitioned table must be refused — whole-table compaction would
    // destroy the pruning layout
    val pdir = Files.createTempDirectory("graft_compact_part").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "source")
      .write.partitionBy("source").parquet(pdir)
    val err = intercept[IllegalArgumentException] {
      graft.io.Io.compactParquet(spark, pdir)
    }
    assert(err.getMessage.contains("partition"))
  }

  test("compactParquet on an object store: copy+delete renames, crash " +
    "in either swap window, self-heal, rows never lost") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftobj.impl", classOf[GraftObjectStoreFs].getName)
    GraftObjectStoreFs.settle()
    val local = Files.createTempDirectory("graft_compact_obj")
    val dir = "graftobj://" + local.toString + "/t"
    (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .repartition(16).write.parquet(dir)
    val expect = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // plain run: the whole protocol over copy+delete renames
    val (b1, a1) = graft.io.Io.compactParquet(spark, dir,
      targetBytes = 512L * 1024)
    assert(b1 == 16 && a1 < b1)
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == expect)
    // fragment again so a second compaction has work to do
    spark.read.parquet(dir).repartition(16).write
      .mode("overwrite").parquet(dir)
    // crash after the copy of swap rename #1 (table -> .old): both the
    // table and .old survive; the next run's self-heal drops .old and
    // completes the compaction
    GraftObjectStoreFs.failWhen = (_, dst) => dst.endsWith(".compact.old")
    intercept[java.io.IOException] {
      graft.io.Io.compactParquet(spark, dir, targetBytes = 512L * 1024)
    }
    GraftObjectStoreFs.settle()
    val (_, a2) = graft.io.Io.compactParquet(spark, dir,
      targetBytes = 512L * 1024)
    assert(a2 < 16)
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == expect)
    // crash after the copy of swap rename #2 (.tmp -> table): .old,
    // .tmp, and the freshly-copied table all survive; self-heal cleans
    // both stragglers and the data still reads back exactly. (The
    // parquet task committers inside the rewrite also rename, all
    // within .compact.tmp — the predicate targets only the swap whose
    // SOURCE is the tmp root itself.)
    spark.read.parquet(dir).repartition(16).write
      .mode("overwrite").parquet(dir)
    GraftObjectStoreFs.failWhen =
      (src, dst) => src.endsWith(".compact.tmp") &&
        !dst.contains(".compact.tmp")
    intercept[java.io.IOException] {
      graft.io.Io.compactParquet(spark, dir, targetBytes = 512L * 1024)
    }
    GraftObjectStoreFs.settle()
    graft.io.Io.compactParquet(spark, dir, targetBytes = 512L * 1024)
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == expect)
  }

  test("compactParquet under listing-after-write delay DOCUMENTS the " +
    "hazard: a listing-driven commit can miss invisible files") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftobj.impl", classOf[GraftObjectStoreFs].getName)
    GraftObjectStoreFs.settle()
    val local = Files.createTempDirectory("graft_compact_lag")
    val dir = "graftobj://" + local.toString + "/t"
    (1 to 500).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .repartition(8).write.parquet(dir)
    // files written from here on are invisible to LISTINGS (point GETs
    // still see them) until settle() — the S3-style consistency split.
    // The rewrite's output files are then missed by the swap's
    // copy-by-listing: this is WHY a production commit on such a store
    // must enumerate from the writer's manifest (the Delta/Iceberg
    // add-file discipline, cf. StreamOps.appendSinkWithStats) or use a
    // pointer flip, never a directory listing.
    GraftObjectStoreFs.hideNewFiles = true
    val r = try Some(graft.io.Io.compactParquet(spark, dir,
      targetBytes = 256L * 1024)) catch { case _: Throwable => None }
    val visibleAfter = r.map(_._2)
    GraftObjectStoreFs.settle()
    // the documented failure shape: the protocol either aborted, or the
    // swapped-in table is missing files the listing could not yet see
    assert(r.isEmpty || visibleAfter.exists(_ < 8),
      s"listing delay went unnoticed: $r — if the commit became " +
        "listing-independent, update this documentation test")
  }
}
