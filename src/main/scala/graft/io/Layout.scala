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
    fileStatsOf(spark.read.parquet(path), cols)

  /** Same manifest over an already-constructed scan — the building block
    * incremental maintenance uses ([[graft.streaming.StreamOps
    * .appendSinkWithStats]] stats ONLY a micro-batch's newly written
    * files and appends those rows to the manifest). */
  def fileStatsOf(scan: DataFrame, cols: Seq[String]): DataFrame =
    scan.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** File-skipping scan: read ONLY the files whose [min,max] envelope for
    * `statCol` intersects [lo, hi], then apply the row-level filter. With
    * a clustered layout (sorted or [[writeZOrdered]]), most files fall
    * wholly outside the envelope and are never opened — the I/O win
    * row-group pruning can't deliver once a table's files are unsorted
    * internally but disjoint externally. The stats frame is metadata-sized,
    * so the driver-side collect is file-count-bounded (same altitude as
    * Spark's own file listing).
    *
    * Stale-stats guard: the stats manifest is reconciled against the
    * CURRENT file listing before any skip decision. A file present on
    * disk but absent from the stats (appended after the stats build) is
    * read UNPRUNED — only the row filter applies, so its rows can never
    * be silently dropped. A file listed in the stats but gone from disk
    * (compacted away) is ignored — its rows live in the newer, unlisted
    * files, which the first rule already reads. The row-level filter
    * always runs, so stale stats cost I/O, never correctness. */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
                 statCol: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    // Normalize "file:///p" (input_file_name form) and "file:/p" (Hadoop
    // Path form) to a bare path so the two listings compare equal.
    def norm(s: String): String =
      try { val u = new java.net.URI(s); if (u.getPath != null) u.getPath else s }
      catch { case _: Exception => s }
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val p = it.next().getPath
        val rel = p.toUri.getPath
        if (!p.getName.startsWith("_") && !p.getName.startsWith(".") &&
          !rel.contains("/_") && !rel.contains("/."))
          b += p
      }
      b.result()
    }
    val statRows = stats
      .select(col("file"), col(s"min_$statCol").cast("long"),
        col(s"max_$statCol").cast("long")).collect()
    val listed = statRows.map(r => norm(r.getString(0))).toSet
    val envelope = statRows.filter { r =>
      !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getLong(2) >= lo && r.getLong(1) <= hi
    }.map(r => norm(r.getString(0))).toSet
    val toRead = onDisk.filter { p =>
      val n = norm(p.toUri.getPath)
      !listed.contains(n) || envelope.contains(n)
    }.map(_.toString)
    if (toRead.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(toRead.toIndexedSeq: _*)
        .filter(col(statCol).between(lo, hi))
  }
}
