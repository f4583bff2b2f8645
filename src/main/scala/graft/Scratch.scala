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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextOps

    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROF $tag%-28s rep$i $dt%7.3f s  rows=$n")
        graft.ops.Leaks.sweep(spark)
      }
    }

    val docs = graft.core.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang")
    time("A1.normalize_only") {
      docs.select(TextOps.normalizeText(col("text")).as("n"))
        .select(sum(length(col("n")))).head; 5000L
    }
    time("A2.plus_hist") {
      val n = docs.select(TextOps.normalizeText(col("text")).as("norm"))
      n.select(length(col("norm")).as("l"))
        .select(sum(col("l"))).head; 5000L
    }
    time("A3.sigs_only") {
      docs.select(TextOps.minhashSignatureFast(col("text"), 16, 3).as("s"))
        .select(count(element_at(col("s"), 1))).head.getLong(0)
    }
    time("A4.bands_only") {
      docs.select(TextOps.lshBandKeys(
          TextOps.minhashSignatureFast(col("text"), 16, 3), 4, 4).as("mh"))
        .select(count(element_at(col("mh"), 1))).head.getLong(0)
    }
    time("A5.norm_nopersist_count") {
      docs.select(col("lang"), col("doc_id").as("id"),
          TextOps.normalizeText(col("text")).as("norm"),
          TextOps.lshBandKeys(
            TextOps.minhashSignatureFast(col("text"), 16, 3), 4, 4).as("mh"))
        .withColumn("len", length(col("norm")))
        .count()
    }
    time("E.noPersist_exhaustive_like_r7") {
      // replicate the r7 unpersisted exhaustive operator inline
      val bw = 33
      val norm = docs.select(col("lang"), col("doc_id").as("id"),
          TextOps.normalizeText(col("text")).as("norm"))
        .withColumn("len", length(col("norm")))
      val keyed = norm.select(col("lang"), col("id"), col("len"),
        explode(array((col("len") / bw).cast("long"),
          (col("len") / bw).cast("long") + lit(1L))).as("band"))
      val l = keyed.select(col("lang"), col("band"), col("id").as("doc_a"), col("len").as("la"))
      val r = keyed.select(col("lang"), col("band"), col("id").as("doc_b"), col("len").as("lb"))
      val cand = l.join(r, Seq("lang", "band")).filter(col("doc_a") < col("doc_b"))
        .filter(abs(col("la") - col("lb")) <= 32)
        .select("doc_a", "doc_b").distinct()
      cand.join(norm.select(col("id").as("doc_a"), col("norm").as("na")), Seq("doc_a"))
        .join(norm.select(col("id").as("doc_b"), col("norm").as("nb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("na"), col("nb"), 32).as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 32).count()
    }
    spark.stop()
  }
}
