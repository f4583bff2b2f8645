package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextOps

    def time[T](tag: String)(f: => T): T = {
      (1 to 2).map { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $tag#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }.last
    }
    val d = "/root/testdata/sf0.1"
    val docs = core.Tables(spark, d, "documents")
    val toks = TextOps.tokens(TextOps.normalizeText(col("text")))
    time("explode tokens count")(
      docs.select(explode(toks).as("w")).count())
    time("uni agg")(
      docs.select(toks.as("t")).select(explode(col("t")).as("w1"))
        .groupBy("w1").agg(count(lit(1))).count())
    val bigramsOfT = {
      val t = col("t")
      when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - 1),
          i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
    }
    time("bigrams explode count")(
      docs.select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), explode(bigramsOfT).as("bg")).count())
    val full = TextOps.bigramLmScore(docs, docs, "doc_id", "text")
    time("full lm")(full.count())
    println(full.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
