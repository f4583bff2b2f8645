package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.io.Io
import graft.ml.Extras
import graft.sim.Similarity
import graft.text.TextOps

/** EP4 (extension) — the LLM-training-corpus build a 100 TB pipeline
  * actually runs, composing the engine's hygiene, dedup, and vector
  * operators end to end:
  *
  *   quality gate → language agreement → exact dedup → minhash near-dup
  *   removal → SEMANTIC near-dup removal (embedding cluster blocking) →
  *   deterministic epoch shuffle → partitioned write → small-file
  *   compaction → JSON manifest with per-stage and per-source accounting.
  *
  * Every stage is an already-verified operator; what this main adds is
  * the COMPOSITION and the output contract (a layout + manifest a
  * training job can consume). Runnable:
  *
  *   runMain graft.pipelines.CorpusBuild <sfDir> <outDir>
  */
object CorpusBuild {

  case class StageCounts(raw: Long, quality: Long, langOk: Long,
                         exactDedup: Long, nearDedup: Long,
                         semanticDedup: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String): StageCounts = {
    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")

    // hygiene: quality gate + language agreement (corpus_pipeline stages)
    val quality = TextOps.qualityFeatures(docs)
      .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000))
    val langOk = quality
      .filter(TextOps.langIdFast(col("text")) === col("lang"))
      .select(docs.columns.map(col): _*)

    // exact dedup, then minhash near-dup removal (drop the larger id)
    val deduped = TextOps.exactDedup(langOk, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = TextOps.minhashNearDupPairs(deduped, "doc_id", "text",
      numHashes = 16, bands = 2, threshold = 0.5)
    val nearKept = deduped.join(
      pairs.select(col("id_b").as("doc_id")), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // semantic dedup: embeddings are keyed by the same ids; drop docs
    // whose vector is a non-representative member of a near-dup component
    val semKeep = Similarity
      .semanticDedupKeep(emb, threshold = 0.999, k = 8, iters = 2)
      .filter(col("keep")).select(col("vec_id").as("doc_id"))
    val semKept = nearKept.join(semKeep, Seq("doc_id"), "left_semi")

    // deterministic epoch shuffle: a cluster-size-independent order
    // column (distributed md5 rank — no global sort)
    val ordered = Extras.hashRank(semKept, "doc_id", seed = 1,
      rankCol = "epoch_order")

    // layout: partitioned by source, then per-partition small-file
    // compaction (the write fans out one file per task otherwise)
    val corpusDir = s"$outDir/corpus"
    Io.writeParquetPartitioned(ordered, corpusDir, Seq("source"))
    val sources = ordered.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    sources.foreach { src =>
      Io.compactParquet(spark, s"$corpusDir/source=$src",
        targetBytes = 64L * 1024 * 1024)
    }

    // accounting: per-stage counts + per-source token mixture
    val counts = StageCounts(docs.count(), quality.count(), langOk.count(),
      deduped.count(), nearKept.count(), semKept.count())
    import spark.implicits._
    val stageDf = Seq((counts.raw, counts.quality, counts.langOk,
      counts.exactDedup, counts.nearDedup, counts.semanticDedup))
      .toDF("n_raw", "n_quality", "n_lang_ok", "n_exact_dedup",
        "n_near_dedup", "n_semantic_dedup")
    val mixture = semKept.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
    Io.writeJson(stageDf, s"$outDir/manifest_stages")
    Io.writeJson(mixture.orderBy("source"), s"$outDir/manifest_mixture")
    deduped.unpersist(); nearKept.unpersist()
    counts
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = PipelineSession.build()
    val c = run(spark, sfDir, outDir)
    println(s"[corpus] raw=${c.raw} quality=${c.quality} lang=${c.langOk} " +
      s"exact=${c.exactDedup} near=${c.nearDedup} semantic=${c.semanticDedup}")
    spark.stop()
  }
}
