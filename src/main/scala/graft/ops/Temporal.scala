package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins beyond the reference's equi-join surface (builder-mandated
  * extension): as-of and interval joins in their 100 TB-safe shapes. The
  * reference aligns tables only by ID (SURVEY.md §2.3); event-time alignment
  * is what a training-data pipeline over logs actually needs.
  */
object Temporal {

  /** Epoch microseconds that tolerates BOTH timestamp encodings: a no-op
    * cast on TIMESTAMP, a session-timezone (pinned UTC) conversion on
    * TIMESTAMP_NTZ — raw `unix_micros` is an analysis error on the latter,
    * which is how a mid-round testdata re-encode broke seven queries at
    * once. Use this instead of `unix_micros` on any event-time column. */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Epoch seconds, same dual-encoding tolerance as [[epochMicros]]. */
  def epochSeconds(c: Column): Column = c.cast("timestamp").cast("long")

  /** As-of join (backward, exact matches allowed): for each left row, the
    * latest right row with rts ≤ lts of the same key. Physically NOT a
    * join: both sides union into one relation, ONE shuffle on the key, and
    * a running last-non-null window fills each left row — the canonical
    * distributed merge_asof (no per-row range probe, never n²).
    *
    * Right rows at equal (ts) order by `tieCol` and the LAST one wins —
    * deterministic, unlike pandas' input-order tie. At equal timestamps
    * right rows sort before left rows, so an exact-time match is visible
    * to the left row (merge_asof's allow_exact_matches=True). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               ltsCol: String, rtsCol: String, valueCols: Seq[String],
               tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(ltsCol))
      .withColumn("__side", lit(1))
    // NTZ-typed tie columns can't cast straight to long — epochSeconds
    // absorbs either timestamp encoding; non-timestamp ties cast as before
    val tie = right.schema(tieCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType => epochSeconds(col(tieCol))
      case _ => col(tieCol).cast("long")
    }
    val r = right.select(
      col(keyCol) +: col(rtsCol).as("__t") +: lit(0).as("__side") +:
        tie.as("__tie") +:
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (acc, c) =>
      acc.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Time-series resample to dense fixed-width buckets with gap fill: per
    * key, every `widthSeconds` bucket between the key's first and last
    * event exists in the output — empty buckets carry n = 0 and a
    * forward-filled `ff_last` (the last observed per-bucket aggregate at or
    * before that bucket).
    *
    * Plan shape (the 100 TB path): aggregate rows to (key, bucket) FIRST
    * (one shuffle, map-side combine), then explode each key's bucket span
    * from a per-key min/max — the dense spine is generated IN the plan
    * (`sequence` + explode, narrow after the agg), never on the driver —
    * and the forward fill is a running last-non-null window per key. */
  def resampleWithGapFill(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, widthSeconds: Long): DataFrame = {
    val bucket = floor(epochMicros(col(tsCol)) / (widthSeconds * 1000000L))
    val agg = df.groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(30,6)")).as("__s"))
    val spine = agg.groupBy(col(keyCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val dense = spine.join(agg, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.select(col(keyCol), col("bucket"),
      coalesce(col("n"), lit(0L)).as("n"),
      col("__s").cast("double").as("bucket_sum"),
      last(col("__s"), ignoreNulls = true).over(w).cast("double").as("ff_last"))
  }

  /** Interval join: all same-key (left, right) pairs with
    * rts ∈ [lts − lag, lts]. The RIGHT side explodes into its lag-width
    * time bucket and the next one, so the join key is (key, bucket) —
    * every candidate pair shares exactly ONE bucket (no dedup needed) and
    * each join group is bounded by bucket occupancy instead of the
    * whole key history (a naive range-predicate join degenerates to
    * per-key n² at scale). The exact range predicate filters after. */
  def intervalJoinBinned(left: DataFrame, right: DataFrame, keyCol: String,
                         ltsCol: String, rtsCol: String,
                         lagSeconds: Long): DataFrame = {
    val lb = left.withColumn("__bin",
      floor(epochSeconds(col(ltsCol)) / lagSeconds))
    val rb = right.withColumn("__bin", explode(array(
      floor(epochSeconds(col(rtsCol)) / lagSeconds),
      floor(epochSeconds(col(rtsCol)) / lagSeconds) + 1)))
    lb.join(rb, Seq(keyCol, "__bin"))
      .filter(col(rtsCol) <= col(ltsCol) &&
        col(rtsCol) >= col(ltsCol) - expr(s"INTERVAL $lagSeconds SECOND"))
      .drop("__bin")
  }

  /** SCD2 (type-2 slowly-changing dimension) history build: each input row
    * is a state change of `keyCol`'s attributes; validity runs [row's ts,
    * next row's ts), open-ended (null `valid_to`, is_current = 1) for the
    * latest row per key. `tieCol` makes the within-timestamp order total so
    * the intervals are deterministic. One shuffle on the dimension key;
    * per-key windows parallelize at any scale. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
           tieCol: String): DataFrame =
    df.withColumnRenamed(tsCol, "valid_from")
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keyCol).orderBy(col("valid_from"), col(tieCol))))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
}
