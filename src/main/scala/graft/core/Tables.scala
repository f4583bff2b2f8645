package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Catalog over a driver-provided scale-factor directory of parquet tables
  * (see TESTDATA.md). One parquet file per table; schemas in FIXTURES.md §7.
  *
  * All engine operators take DataFrames, so this is the only place that knows
  * about paths. At cluster scale the same API would point at a warehouse
  * directory; nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config required to scan the driver's tables: events.ts is
    * parquet TIMESTAMP(NANOS), which Spark only reads as a long. */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Restore event-time semantics for the nanos column (lossless here:
    // the generator emits microsecond-resolution values).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
