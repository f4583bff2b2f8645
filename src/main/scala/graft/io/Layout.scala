package graft.io

import org.apache.spark.sql.{Column, DataFrame}
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
}
