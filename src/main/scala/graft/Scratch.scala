package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract; removed or kept
  * idle between investigations). Current subject: the round-7 substring /
  * edit-distance near-dup stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()

    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROF $tag%-34s rep$i $dt%7.3f s  rows=$n")
        spark.catalog.clearCache()
      }
    }

    import graft.text.TextOps
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val k = 8

    val toks = TextOps.tokens(TextOps.normalizeText(col("text")))
    val grams = when(size(toks) < k, array(md5(concat_ws(" ", toks))))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(k)))))))

    time("ss.gramsOnly") {
      docs.select(col("doc_id"), grams.as("g")).count()
    }
    time("ss.gramsExplode") {
      docs.select(col("doc_id").as("id"), explode(grams).as("gram")).count()
    }
    time("ss.keptCount") {
      val g = docs.select(col("doc_id").as("id"), explode(grams).as("gram"))
      g.groupBy("gram").agg(count(lit(1)).as("gdf"))
        .filter(col("gdf").between(2, 16)).count()
    }
    time("ss.full") {
      TextOps.sharedSpanPairs(docs, "doc_id", "text", 8, 16).count()
    }
    time("ed.normOnly") {
      docs.select(TextOps.normalizeText(col("text")).as("n")).count()
    }
    time("ed.candOnly") {
      val bw = 33
      val norm = docs.select(col("lang"), col("doc_id").as("id"),
        TextOps.normalizeText(col("text")).as("norm"))
        .withColumn("len", length(col("norm")))
      val keyed = norm.select(col("lang"), col("id"),
        explode(array((col("len") / bw).cast("long"),
          (col("len") / bw).cast("long") + lit(1L))).as("band"))
      keyed.withColumnRenamed("id", "doc_a")
        .join(keyed.withColumnRenamed("id", "doc_b"), Seq("lang", "band"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
    }
    time("ed.full") {
      TextOps.editNearDupPairs(docs, "doc_id", "text", 32, Seq("lang")).count()
    }
    spark.stop()
  }
}
