package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ shape): a set of
  * named checks evaluated in ONE aggregation pass over the table,
  * producing a (check, violations, total, pass) report row per check.
  *
  * Scale design: every check is an aggregate expression, so the whole
  * suite — however many checks — costs one scan with map-side partials
  * and a single-row exchange; the row-to-report pivot happens on that one
  * row (explode of a literal-keyed map, not a driver collect). Uniqueness
  * checks add a partial-distinct on their key struct, still one pass.
  * This is the gate a 100 TB ingest runs BEFORE publishing a partition:
  * the report is tiny, the cost is the read you were already paying.
  */
object Checks {

  /** violations = rows where `cond` is false or null. Coalesced to 0 on
    * an empty input — an ingest gate may legitimately see an empty
    * partition, and it should pass, not report null. */
  def violations(cond: Column): Column =
    coalesce(sum(when(cond, 0L).otherwise(1L)), lit(0L))

  /** Not-null completeness check on a column. */
  def complete(c: String): (String, Column) =
    s"complete_$c" -> violations(col(c).isNotNull)

  /** Closed-range check (null fails). */
  def inRange(c: String, lo: Double, hi: Double): (String, Column) =
    s"range_$c" -> violations(col(c).between(lo, hi))

  /** Domain-membership check (null fails). */
  def inSet(c: String, values: Seq[String]): (String, Column) =
    s"domain_$c" -> violations(col(c).isin(values: _*))

  /** Key-uniqueness check: violations = duplicate-row surplus. */
  def unique(cols: Seq[String]): (String, Column) =
    s"unique_${cols.mkString("_")}" ->
      (count(lit(1)) - count_distinct(struct(cols.map(col): _*)))

  /** Evaluate `checks` in one pass: rows (check_name, violations, total,
    * pass), ordered by check_name. */
  def constraintReport(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (n, c) => c.as(n) } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.flatMap { case (n, _) => Seq(lit(n), col(n)) }
    one
      .select(explode(map(pairs: _*)).as(Seq("check_name", "violations")),
        col("__total").as("total"))
      .select(col("check_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
      .orderBy("check_name")
  }
}
