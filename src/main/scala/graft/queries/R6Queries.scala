package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expressions.TopKRows

/** Round-6 additions: per-group top-k via the bounded-heap aggregate
  * ([[graft.expressions.TopKRows]]) instead of the window row_number plan.
  * The aggregate participates in partial aggregation, so each map task
  * emits ≤ k rows per group before the exchange — the shuffle carries
  * O(groups·k·tasks) entries instead of the whole fact table, which is the
  * difference between a per-group top-n that survives 100 TB and one that
  * sorts every row. Same oracle shape as a row_number query: the kept set
  * is exactly ORDER BY score DESC, id ASC LIMIT k per group.
  */
object R6Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_w_topk_agg" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(TopKRows.topRows(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("o_orderkey"),
          col("col.score").as("o_totalprice"))
        .orderBy("o_orderpriority", "rnk"))
  )

  val oracles: Map[String, String] = Map(
    "q_w_topk_agg" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rnk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rnk""".stripMargin
  )
}
