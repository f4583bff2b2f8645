package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * parquet writes.
  *
  * A table sorted on one key prunes row groups only for filters on that
  * key; interleaving the bits of TWO dimension keys makes each output
  * file cover a small rectangle in BOTH dimensions, so min/max row-group
  * pruning works for filters on either — the layout optimization
  * warehouse engines run as `OPTIMIZE ... ZORDER BY`. The z-value is
  * pure integer bit arithmetic (no UDF, codegen-friendly, and
  * expressible identically in any SQL engine), and the write is one
  * range shuffle: range-partition by z, sort within partitions, write.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative integer columns
    * (Morton code): bit i of `a` lands at 2i, bit i of `b` at 2i+1. The
    * per-bit terms occupy disjoint positions, so plain addition is the
    * union. Caller guarantees both inputs fit in `bits` bits (bucket or
    * rank them first). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` as parquet Z-ordered on two bucketed integer dimensions:
    * ONE range shuffle on the interleaved key, an in-partition sort, and
    * a straight write — no global sort, no driver involvement. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int = 16, numFiles: Int = 8): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Per-file min/max statistics for `cols` over a parquet table — the
    * poor-man's Delta/Iceberg manifest. ONE distributed pass: group by
    * `input_file_name()`, min/max each column; the result is file-count-
    * sized (metadata scale, not data scale) and is the index
    * [[prunedRead]] skips files with. Rebuild after compaction/append —
    * like any manifest, it describes the files it was built from. */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** File-skipping scan: read ONLY the files whose [min,max] envelope for
    * `statCol` intersects [lo, hi], then apply the row-level filter. With
    * a clustered layout (sorted or [[writeZOrdered]]), most files fall
    * wholly outside the envelope and are never opened — the I/O win
    * row-group pruning can't deliver once a table's files are unsorted
    * internally but disjoint externally. The stats frame is metadata-sized,
    * so the driver-side collect is file-count-bounded (same altitude as
    * Spark's own file listing); row correctness NEVER depends on the
    * stats — the row filter still runs, so stale stats can only lose the
    * skip, not rows... which is why `fileStats` must cover a superset of
    * the live files (guarded here). */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
                 statCol: String, lo: Long, hi: Long): DataFrame = {
    val live = stats
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select("file").collect().map(_.getString(0))
    if (live.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(live.toIndexedSeq: _*)
        .filter(col(statCol).between(lo, hi))
  }
}
