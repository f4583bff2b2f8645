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

  /** md5-register HyperLogLog (Flajolet et al. 2007, the 32-bit original:
    * m = 64 registers, α₆₄ = 0.709, linear-counting small-range and
    * 2³²-based large-range corrections). Unlike the DataSketches
    * aggregates above, every step is bit-reproducible across engines, so
    * THIS estimator ships with a hash-exact DuckDB oracle:
    *
    *   - hash = first 8 md5 hex digits as a 32-bit integer (engine-stable);
    *   - register = top 6 bits (shiftright), rank = leading-zero count of
    *     the remaining 26 bits + 1 via `27 - length(bin(w))` — pure
    *     integer/string ops, no float log2 whose boundary rounding could
    *     diverge;
    *   - Σ 2^(−M_j) accumulates EXACTLY in doubles regardless of order:
    *     every term is a multiple of 2⁻²⁷ and the total stays below 2⁶,
    *     so each partial sum needs ≤ 33 mantissa bits — well inside a
    *     double. No decimal accumulator required;
    *   - the correction branches' ln() goes through the DECIMAL(30,12)
    *     cast discipline, then an exact double multiply by the m / 2³²
    *     constant (both powers of two).
    *
    * Scale shape: one groupBy(group, register) — at most 64·|groups| rows
    * exit the exchange with map-side combine — then a 64-row-per-group
    * rollup. σ ≈ 1.04/√64 ≈ 13%; raise b for tighter error, the plan
    * shape is unchanged. */
  def hllMd5PerGroup(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val m = 64
    val rankBits = 26 // 32 - log2(m)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = h.bitwiseAND(lit((1L << rankBits) - 1))
    val rank = when(w === 0, rankBits + 1)
      .otherwise(lit(rankBits + 1) - length(bin(w)))
    val regs = df
      .select(col(groupCol), shiftright(h, rankBits).as("reg"), rank.as("r"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max("r").as("mr"))
    val est = regs.groupBy(col(groupCol))
      .agg((sum(lit(1.0) /
          expr("shiftleft(CAST(1 AS BIGINT), mr)").cast("double")) +
          (lit(m) - count(lit(1)))).as("s"),
        (lit(m) - count(lit(1))).as("v0"))
      .withColumn("raw", lit(0.709 * m * m) / col("s"))
    val two32 = 4294967296.0
    est.withColumn("approx_distinct",
        when(col("raw") <= 2.5 * m && col("v0") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v0"))
            .cast(org.apache.spark.sql.types.DecimalType(30, 12))
            .cast("double"))
          .when(col("raw") > two32 / 30.0,
            lit(-two32) * log(lit(1.0) - col("raw") / two32)
              .cast(org.apache.spark.sql.types.DecimalType(30, 12))
              .cast("double"))
          .otherwise(col("raw")))
      .select(col(groupCol), col("approx_distinct"))
  }

  /** Approximate top-k heavy hitters of `valueCol` (frequent-items
    * sketch): (item, estimated count) rows, k items. */
  def approxTopK(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.agg(expr(s"approx_top_k(`$valueCol`, $k)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est_count"))

  /** Count-Min bucket for hash row `row`: the first 24 md5 bits of
    * `"row:item"` mod `width`. md5 is engine-stable (Spark == DuckDB ==
    * RFC 1321), so unlike the DataSketches aggregates above, a CMS built
    * this way is bit-reproducible across engines — the one sketch in the
    * family that ships with a hash-exact oracle rather than error-bound
    * property tests. */
  def cmsBucket(item: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), item.cast("string"))), 1, 6),
      16, 10).cast("long") % width

  /** Count-Min sketch of `itemCol` frequencies: `depth`×`width` counters
    * as rows (row, bucket, cnt). ONE scan — each input row explodes to
    * `depth` (row, bucket) cells, then a single map-side-combined groupBy
    * on a key space of at most depth·width cells, so the exchange carries
    * O(depth·width) partial counters per task no matter the input size.
    * Like the HLL sketches, CMS cells merge by addition — per-partition /
    * per-day sketches roll up without re-reading data. */
  def countMinSketch(df: DataFrame, itemCol: String,
                     depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(col(itemCol), r, width).as("bucket"))): _*)
    df.select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate item frequencies from a CMS: min over the `depth`
    * counters each item hashes to. Never underestimates; overestimates by
    * collision mass ≤ e·N/width with prob ≥ 1−e^−depth (Cormode &
    * Muthukrishnan 2005). The query side explodes to (row, bucket) probes
    * and joins the sketch on its tiny (row, bucket) key — with the sketch
    * broadcast, estimation is a map-only pass over the queries. The join
    * is LEFT outer with missing cells coalesced to 0: an item none of
    * whose cells were ever incremented must estimate 0 (the true CMS
    * semantics), and an item with SOME empty cells must take those 0s
    * into its min rather than min-ing only the populated counters. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(col(itemCol), r, width).as("bucket"))): _*)
    queries.select(col(itemCol), explode(cells).as("c"))
      .select(col(itemCol), col("c.row").as("row"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
