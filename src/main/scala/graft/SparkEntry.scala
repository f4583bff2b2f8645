package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Num
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-area packs; every query has a matching
  * DuckDB oracle unless its semantics aren't SQL-expressible (those get the
  * driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (TPC-H Q5 shape: star join
    * through broadcast dims + exact-decimal revenue). Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_j2_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ StatsQueries.queries ++
      TextSimQueries.queries ++ StreamQueries.queries ++ MlQueries.queries ++
      MultimodalQueries.queries ++ ExtQueries.queries ++ PipeQueries.queries ++
      R4Queries.queries ++ TpchPlusQueries.queries ++
      WarehouseQueries.queries ++ R5Queries.queries ++ R6Queries.queries ++
      R7Queries.queries ++ R8Queries.queries ++ R9Queries.queries ++
      ForestQueries.queries ++ Ep4Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ StatsQueries.oracles ++
      TextSimQueries.oracles ++ StreamQueries.oracles ++ MlQueries.oracles ++
      MultimodalQueries.oracles ++ ExtQueries.oracles ++ PipeQueries.oracles ++
      R4Queries.oracles ++ TpchPlusQueries.oracles ++
      WarehouseQueries.oracles ++ R5Queries.oracles ++ R6Queries.oracles ++
      R7Queries.oracles ++ R8Queries.oracles ++ R9Queries.oracles ++
      ForestQueries.oracles ++ Ep4Queries.oracles
}
