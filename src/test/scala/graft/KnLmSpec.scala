package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Kneser-Ney bigram LM: exact normalization (the add-one continuation
  * smoothing preserves Σ_{w2∈V} p(w2|w1) = 1 because Σ_w N₁₊(·w) equals
  * the distinct-bigram count), ranking behavior, and OOV totality. */
class KnLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "a cat and a dog met"),
    (3L, "the cat and the dog sat"))
    .toDF("doc_id", "text")

  test("KN distribution sums to exactly 1 over the vocabulary for every context") {
    val vocabWords = corpus
      .select(explode(TextOps.tokens(TextOps.normalizeText(col("text")))).as("w"))
      .distinct().as[String].collect().sorted
    val pairs = (for (a <- vocabWords; b <- vocabWords) yield (a, b))
      .toSeq.toDF("w1", "w2")
    val sums = TextOps.kneserNeyProbs(corpus, pairs, "text")
      .groupBy("w1").agg(sum("p").as("s"))
      .select("w1", "s").as[(String, Double)].collect()
    assert(sums.length == vocabWords.length)
    sums.foreach { case (w1, s) =>
      assert(math.abs(s - 1.0) < 1e-12, s"sum over w2 for context '$w1' = $s")
    }
  }

  test("in-distribution text outranks gibberish; OOV text still scores (total model)") {
    val docs = Seq(
      (10L, "the cat sat on the mat"),  // in-distribution
      (11L, "zzq qxv wvk pqj zzq xxj"), // fully OOV gibberish
      (12L, "mat the on sat cat the"))  // right words, wrong order
      .toDF("doc_id", "text")
    val scored = TextOps.kneserNeyLmScore(corpus, docs, "doc_id", "text")
      .select("doc_id", "avg_lp").as[(Long, Double)].collect().toMap
    assert(scored.size == 3)
    assert(scored.values.forall(v => !v.isNaN && !v.isInfinite),
      s"KN must be total: $scored")
    assert(scored(10L) > scored(11L), s"in-dist must beat OOV gibberish: $scored")
    assert(scored(10L) > scored(12L), s"order must matter: $scored")
  }

  test("scores are partitioning-invariant (DECIMAL log sums)") {
    val a = TextOps.kneserNeyLmScore(corpus.repartition(1), corpus.repartition(1),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = TextOps.kneserNeyLmScore(corpus.repartition(7), corpus.repartition(5),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
