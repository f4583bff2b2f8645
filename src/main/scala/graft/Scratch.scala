package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract; removed or kept
  * idle between investigations). */
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

    val docs = graft.core.Tables(spark, sfDir, "documents")
    val docs2 = docs.unionByName(
      docs.select(col("doc_id") + 100000, col("text"), col("lang"),
        col("source"), col("n_chars")).toDF(docs.columns: _*))

    // --- corpus pipeline stages ---
    time("cp.quality") {
      graft.text.TextOps.qualityFeatures(docs)
        .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000)).count()
    }
    time("cp.langFilter") {
      val q = graft.text.TextOps.qualityFeatures(docs)
        .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000))
      q.filter(graft.text.TextOps.langIdFast(col("text")) === col("lang")).count()
    }
    time("cp.exactDedup") {
      val q = graft.text.TextOps.qualityFeatures(docs)
        .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000))
        .filter(graft.text.TextOps.langIdFast(col("text")) === col("lang"))
        .select(docs.columns.map(col): _*)
      graft.text.TextOps.exactDedup(q, "doc_id", "text").count()
    }
    time("cp.full") {
      graft.queries.TextSimQueries.queries("q_x_corpus_pipeline")(spark, sfDir).count()
    }

    // --- minhash neardup stages ---
    time("mh.sigsOnly") {
      docs2.select(col("doc_id"),
        graft.text.TextOps.minhashSignatureFast(col("text"), 16, 3).as("s")).count()
    }
    time("mh.full") {
      graft.queries.TextSimQueries.queries("q_x_minhash_neardup")(spark, sfDir).count()
    }

    // --- simhash neardup stages ---
    time("sh.sigsOnly") {
      docs2.select(col("doc_id"),
        graft.text.TextOps.simhashFast(col("text"), 32).as("s")).count()
    }
    time("sh.full") {
      graft.queries.TextSimQueries.queries("q_x_simhash_neardup")(spark, sfDir).count()
    }

    // --- embed neardup ---
    time("em.full") {
      graft.queries.TextSimQueries.queries("q_x_embed_neardup")(spark, sfDir).count()
    }

    // --- corr prune / spearman / best_per_type / yeojohnson ---
    time("corr.full") {
      graft.queries.MlQueries.queries("q_a16_corr_prune")(spark, sfDir).count()
    }
    time("spearman.full") {
      graft.queries.StatsQueries.queries("q_t8_spearman")(spark, sfDir).count()
    }
    time("bestPerType.full") {
      graft.queries.MlQueries.queries("q_e_best_per_type")(spark, sfDir).count()
    }
    time("yj.full") {
      graft.queries.MlQueries.queries("q_m4_yeojohnson_lambda")(spark, sfDir).count()
    }
    time("ntile.full") {
      graft.queries.ExtQueries.queries("q_w_ntile")(spark, sfDir).count()
    }
    time("j1.full") {
      graft.queries.CoreQueries.queries("q_j1_top_revenue")(spark, sfDir).count()
    }
    time("exceptIntersect.full") {
      graft.queries.ExtQueries.queries("q_u_except_intersect")(spark, sfDir).count()
    }
    time("clusters.full") {
      graft.queries.TextSimQueries.queries("q_x_neardup_clusters")(spark, sfDir).count()
    }
    spark.stop()
  }
}
