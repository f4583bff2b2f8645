package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.{CorpusBuild, Etl, Experiment, Tournament}

/** End-to-end runs of the reference's three entry points at sf0.001 —
  * the same mains the driver can invoke, kept green by `sbt test`. */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("EP1 etl writes imputed stratified splits") {
    val out = tmp("ep1")
    val result = Etl.run(spark, sfDir, out)
    assert(result.count() > 0)
    val train = spark.read.parquet(s"$out/train.parquet")
    val test = spark.read.parquet(s"$out/test.parquet")
    assert(train.count() > test.count() && test.count() > 0)
    // imputation left no nulls in the cleaned value column
    assert(train.filter(col("v").isNull).count() == 0)
    assert(train.columns.contains("label") && !train.columns.contains("mostly_null"))
  }

  test("EP2 experiment produces a best-config relation incl. the stack") {
    val out = tmp("ep2")
    val best = Experiment.run(spark, sfDir, out).collect()
    assert(best.nonEmpty)
    assert(best.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(spark.read.json(s"$out/results_store").count() == 3)
  }

  test("EP3 tournament emits CV summary and significance comparisons") {
    val out = tmp("ep3")
    val comparisons = Tournament.run(spark, sfDir, out)
    assert(comparisons.count() == 3) // best vs each of the 3 others
    val summary = spark.read.option("header", "true").csv(s"$out/cv_summary.csv")
    assert(summary.count() == 4)
    assert(comparisons.columns.contains("stars"))
  }

  test("EP4 corpus build composes hygiene, dedup, shuffle, layout, manifest") {
    val out = tmp("ep4")
    val c = CorpusBuild.run(spark, sfDir, out)
    // each stage can only shrink the corpus — monotone through ALL of the
    // hygiene + four-modality dedup chain (LM gate off by default: no-op)
    assert(c.raw >= c.quality && c.quality >= c.langOk &&
      c.langOk == c.lmOk &&
      c.lmOk >= c.exactDedup && c.exactDedup >= c.nearDedup &&
      c.nearDedup >= c.substringDedup && c.substringDedup >= c.editDedup &&
      c.editDedup >= c.semanticDedup && c.semanticDedup > 0)
    // partitioned + compacted output holds exactly the surviving docs
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == c.semanticDedup)
    assert(corpus.columns.contains("source") &&
      corpus.columns.contains("epoch_order"))
    // the epoch shuffle is a permutation: every rank distinct
    assert(corpus.select("epoch_order").distinct().count() == c.semanticDedup)
    // partition pruning works on the layout
    val onePart = corpus.filter(col("source") === "src1")
    assert(onePart.count() > 0 && onePart.count() < c.semanticDedup)
    // manifests reconcile with the data
    val stages = spark.read.json(s"$out/manifest_stages").collect().head
    assert(stages.getAs[Long]("n_semantic_dedup") == c.semanticDedup)
    val mixture = spark.read.json(s"$out/manifest_mixture")
    assert(mixture.agg(sum("n_docs")).head.getLong(0) == c.semanticDedup)
    // per-stage wall-times made it into the manifest
    val timings = spark.read.json(s"$out/manifest_timings")
    val stagesTimed = timings.select("stage").collect().map(_.getString(0)).toSet
    assert(Set("write_partitioned", "compact", "substring_dedup",
      "edit_dedup", "semantic_dedup").subsetOf(stagesTimed))
    assert(timings.filter(col("wall_ms") < 0).count() == 0)
    // the pipeline sweeps its own cached blocks before returning
    assert(graft.ops.Leaks.persistentRddCount(spark) == 0)
  }

  test("EP4 LM quality gate drops the low-likelihood tail when enabled") {
    val out = tmp("ep4lm")
    val c = CorpusBuild.run(spark, sfDir, out, withSubstringDedup = false,
      withEditDedup = false, lmQualityDropFrac = 0.1)
    // the gate cuts at the 10th percentile of avg_lp: at least the tail
    // below the cutoff is gone, and the stage stays monotone
    assert(c.lmOk < c.langOk, s"LM gate dropped nothing (${c.langOk})")
    assert(c.lmOk >= (c.langOk * 0.8).toLong,
      s"LM gate over-dropped: ${c.lmOk} of ${c.langOk}")
    assert(c.lmOk >= c.exactDedup && c.semanticDedup > 0)
    val stages = spark.read.json(s"$out/manifest_stages").collect().head
    assert(stages.getAs[Long]("n_lm_ok") == c.lmOk)
    graft.ops.Leaks.sweep(spark)
  }

  test("EP4 refuses a high-cardinality partition key before any layout") {
    val out = tmp("ep4guard")
    val ex = intercept[IllegalArgumentException] {
      CorpusBuild.run(spark, sfDir, out, partitionCol = "doc_id",
        maxPartitionFanout = 16)
    }
    assert(ex.getMessage.contains("doc_id") &&
      ex.getMessage.contains("low-cardinality"))
    // nothing was written
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/corpus")))
    graft.ops.Leaks.sweep(spark)
  }
}
