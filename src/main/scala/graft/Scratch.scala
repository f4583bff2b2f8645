package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROF $tag%-28s rep$i $dt%7.3f s  rows=$n")
        spark.catalog.clearCache()
      }
    }

    import graft.text.TextOps
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val maxDist = 32; val bw = 33
    val blockCols = Seq("lang")
    val norm = docs.select((blockCols.map(col) :+ col("doc_id").as("id") :+
      TextOps.normalizeText(col("text")).as("norm")): _*)
      .withColumn("len", length(col("norm")))

    // A: narrow band join -> filter len only after ids (no hist anywhere)
    time("A.narrowJoinCount") {
      val keyed = norm.select((blockCols.map(col) :+ col("id") :+ col("len") :+
        explode(array((col("len") / bw).cast("long"),
          (col("len") / bw).cast("long") + lit(1L))).as("band")): _*)
      val l = keyed.select(col("lang"), col("band"), col("id").as("doc_a"), col("len").as("la"))
      val r = keyed.select(col("lang"), col("band"), col("id").as("doc_b"), col("len").as("lb"))
      l.join(r, Seq("lang", "band")).filter(col("doc_a") < col("doc_b"))
        .filter(abs(col("la") - col("lb")) <= maxDist)
        .select("doc_a", "doc_b").distinct().count()
    }
    // B: same + hist carried + L1 filter in-stage
    time("B.histJoinCount") {
      val n2 = norm.withColumn("hist",
        array(("abcdefghijklmnopqrstuvwxyz0123456789 ").map(c =>
          length(col("norm")) - length(replace(col("norm"), lit(c.toString), lit("")))): _*))
      val keyed = n2.select((blockCols.map(col) :+ col("id") :+ col("len") :+
        col("hist") :+
        explode(array((col("len") / bw).cast("long"),
          (col("len") / bw).cast("long") + lit(1L))).as("band")): _*)
      val l = keyed.select(col("lang"), col("band"), col("id").as("doc_a"),
        col("len").as("la"), col("hist").as("ha"))
      val r = keyed.select(col("lang"), col("band"), col("id").as("doc_b"),
        col("len").as("lb"), col("hist").as("hb"))
      l.join(r, Seq("lang", "band")).filter(col("doc_a") < col("doc_b"))
        .filter(abs(col("la") - col("lb")) <= maxDist)
        .filter(graft.expressions.IntL1Capped.l1Capped(col("ha"), col("hb"),
          2L * maxDist) <= 2L * maxDist)
        .select("doc_a", "doc_b").distinct().count()
    }
    // C: current operator end-to-end
    time("C.operator") {
      TextOps.editNearDupPairs(docs, "doc_id", "text", maxDist, blockCols).count()
    }
    spark.stop()
  }
}
