package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves disjoint bits (matches hand-computed Morton codes)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    // morton(5=0101, 3=0011) = b0: 1@0, b1: 1@1 | a: 1@0->0? compute:
    // a bits (0..3)=1,0,1,0 -> positions 0,2,4,6 = 1,0,1,0 -> 1+16=17
    // b bits        =1,1,0,0 -> positions 1,3,5,7 = 2+8=10 -> z=27
    assert(rows == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("z-ordered write shrinks per-file bounding boxes in BOTH dimensions") {
    // full 64x64 grid, one row per cell
    val df = spark.range(4096).select(
      expr("id div 64").as("x"), pmod(col("id"), lit(64L)).as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("zord").toString
    val xdir = java.nio.file.Files.createTempDirectory("xsort").toString
    Layout.writeZOrdered(df, zdir, "x", "y", bits = 6, numFiles = 8)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)
    def avgSpan(dir: String, c: String): Double =
      spark.read.parquet(dir).withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).as[Double].head()
    // 8 files over a 64x64 z-curve: each file covers a ~contiguous z range
    // = a small rectangle, so BOTH dims stay well under the 63 full span.
    assert(avgSpan(zdir, "x") < 40, "z-order x-span")
    assert(avgSpan(zdir, "y") < 40, "z-order y-span")
    // a single-dimension sort clusters x but leaves y at ~full span —
    // the asymmetry z-ordering removes
    assert(avgSpan(xdir, "x") < 10, "x-sort x-span")
    assert(avgSpan(xdir, "y") > 55, "x-sort y-span stays wide")
  }

  test("fileStats + prunedRead skip files and return exactly the filtered rows") {
    val df = spark.range(4096).select(
      expr("id div 64").as("x"), pmod(col("id"), lit(64L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("skip").toString
    // x-sorted layout: 8 files, each covering ~8 consecutive x values
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dir)
    val stats = Layout.fileStats(spark, dir, Seq("x", "y"))
    assert(stats.count() == 8)
    // rows metadata reconciles with the table
    assert(stats.agg(sum("rows")).as[Long].head() == 4096L)
    val pruned = Layout.prunedRead(spark, dir, stats, "x", 10, 12)
    val expect = df.filter(col("x").between(10, 12))
    assert(pruned.count() == expect.count())
    assert(pruned.select(sum(col("x") * lit(1000) + col("y"))).as[Long].head() ==
      expect.select(sum(col("x") * lit(1000) + col("y"))).as[Long].head())
    // the skip actually happened: a 3-value x-range touches ≤2 of 8 files
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched <= 2, s"expected ≤2 files read, got $touched")
    // empty envelope: schema preserved, zero rows, zero files opened
    assert(Layout.prunedRead(spark, dir, stats, "x", 999, 1000).count() == 0L)
  }

  test("prunedRead stale-stats guard: appended files are read unpruned, compacted files dropped") {
    val df = spark.range(4096).select(
      expr("id div 64").as("x"), pmod(col("id"), lit(64L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("stale").toString
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dir)
    // Materialize the manifest, then mutate the table under it.
    val stats = Layout.fileStats(spark, dir, Seq("x", "y")).cache()
    assert(stats.count() == 8)
    // APPEND rows in the probe range AFTER the stats build: a naive
    // pruner would silently drop them; the guard reads unlisted files.
    Seq((11L, 999L), (500L, 1L)).toDF("x", "y")
      .coalesce(1).write.mode("append").parquet(dir)
    val pruned = Layout.prunedRead(spark, dir, stats, "x", 10, 12)
    assert(pruned.count() == 64L * 3 + 1,
      "appended row in range must survive stale stats")
    assert(pruned.filter(col("y") === 999).count() == 1L)
    // the skip still happens for LISTED files: ≤2 old + 1 appended
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched <= 3, s"expected ≤3 files read, got $touched")
    // COMPACT: rewrite the whole table; every stats-listed file is gone.
    // prunedRead must not fail on vanished files — all live files are
    // unlisted, so the scan degrades to an unpruned-but-correct read.
    val dir2 = java.nio.file.Files.createTempDirectory("stale2").toString
    df.write.mode("overwrite").parquet(dir2)
    val stats2 = Layout.fileStats(spark, dir2, Seq("x")).cache()
    stats2.count()
    spark.read.parquet(dir2).repartition(2)
      .write.mode("overwrite").parquet(dir2 + "_c")
    // simulate in-place compaction: point the read at the new files with
    // the old manifest
    val afterCompact = Layout.prunedRead(spark, dir2 + "_c", stats2, "x", 10, 12)
    assert(afterCompact.count() == df.filter(col("x").between(10, 12)).count())
    stats.unpersist(); stats2.unpersist()
  }
}
