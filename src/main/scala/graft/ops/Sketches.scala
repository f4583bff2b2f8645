package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch aggregates (Spark 4.x built-ins over Apache
  * DataSketches): the sub-linear-memory path for cardinality and
  * heavy-hitter questions a 100 TB pipeline cannot answer exactly without
  * a full shuffle of the key space.
  *
  * Scale design notes:
  *   - `hll_sketch_agg` buffers are KB-sized regardless of cardinality, so
  *     a per-group distinct estimate shuffles only sketch bytes — compare
  *     `countDistinct`, which expands every (group, value) pair through
  *     the exchange.
  *   - sketches MERGE associatively (`hll_union_agg`), which is what makes
  *     incremental / partitioned maintenance possible: per-partition
  *     sketches roll up without re-reading data (the same reason the
  *     incremental-aggregate operator keeps decimal partials).
  *   - estimates are deterministic for a fixed input multiset but NOT
  *     reproducible across engines — so these ship with property tests
  *     (relative-error and merge-consistency bounds, SketchSpec) instead
  *     of a DuckDB hash oracle.
  */
object Sketches {

  /** Approximate distinct values of `valueCol` per group: one pass,
    * fixed-size state (lgConfigK=12 ⇒ ~0.8% typical rel. error). */
  def approxDistinctPerGroup(df: DataFrame, groupCol: String,
                             valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_distinct"))

  /** Per-group HLL sketches merged into a global estimate — the
    * partitioned-maintenance shape: group sketches persist as bytes,
    * the rollup never touches raw data again. */
  def mergedDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
        .as("approx_distinct_total"))

  /** Approximate top-k heavy hitters of `valueCol` (frequent-items
    * sketch): (item, estimated count) rows, k items. */
  def approxTopK(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.agg(expr(s"approx_top_k(`$valueCol`, $k)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est_count"))
}
