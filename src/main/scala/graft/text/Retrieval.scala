package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Num.dsum12

/** Retrieval-style scoring over the document corpus: BM25 ranking and
  * train/eval n-gram decontamination — the two lookup-shaped operations a
  * training-data pipeline runs beside the dedup family.
  *
  * Numeric convention: scores are built from exact integer counts with a
  * fixed double expression tree, and per-term partial scores accumulate
  * through decimal(30,12) (order-independent) — so a DuckDB oracle running
  * the same expression text reproduces every score bit-for-bit. No libm
  * call (log/exp/pow) anywhere in the ranking path: BM25's idf uses the
  * RATIONAL form (N − df + ½)/(df + ½) instead of its log — the same
  * per-term monotonicity in df (what the ranking needs), none of the
  * cross-engine 1-ulp divergence (what the oracle can't absorb).
  */
object Retrieval {

  /** BM25 (rational-idf variant) of a fixed query-term list against every
    * document. Plan shape (the 100 TB path):
    *   1. tokenize + filter to query terms BEFORE aggregating — the
    *      doc-term relation only ever contains |terms| entries per doc;
    *   2. df/avgdl/N are tiny aggregates broadcast into the scoring join;
    *   3. per-(doc, term) scores decimal-sum per doc — one shuffle on
    *      doc_id, whose width is bounded by |query terms|.
    * Returns (idCol, score) for docs containing ≥1 query term. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextOps.tokens(TextOps.normalizeText(col(textCol)))
    val base = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("token"))
    val hits = base.filter(col("token").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("token"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // N and avgdl over the WHOLE corpus (docs without query terms count)
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(TextOps.normalizeText(col(textCol))))
        .cast("long")).as("sum_dl"))
    val scored = tf.join(broadcast(dfRel), Seq("token"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      // fixed expression tree — mirrored textually by the SQL oracle
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("score_t",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
    scored.groupBy(col(idCol)).agg(dsum12(col("score_t")).as("score"))
  }

  /** Decontamination scan: fraction of each train document's distinct
    * n-grams that appear in ANY eval document (the overlap check run
    * before an eval set is trusted). Plan shape:
    *   eval n-grams → distinct (small); train n-grams explode and
    *   LEFT SEMI join the eval set on the n-gram hash — the match
    *   relation never carries text, and the join key is a 128-bit md5.
    * Returns (idCol, n_ngrams, n_contaminated, contamination). */
  def ngramContamination(train: DataFrame, eval_ : DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame, extra: Column*) =
      df.select(extra :+
        explode(TextOps.distinctShinglesFast(col(textCol), n)).as("gram"): _*)
        .withColumn("gh", md5(col("gram"))).drop("gram")
    val evalGrams = grams(eval_).distinct()
    val trainGrams = grams(train, col(idCol))
    val flagged = trainGrams.join(evalGrams, Seq("gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    trainGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) /
          col("n_ngrams").cast("double")).as("contamination"))
  }

  /** Reciprocal-rank fusion of two k-bounded rankings (hybrid search —
    * e.g. a lexical and a vector candidate list): score = Σ 1/(k0 + rank)
    * over the lists containing the doc (Cormack et al., SIGIR'09). The
    * score is ONE fixed-order sum of two exact double divisions, so the
    * fused ordering is engine-independent with no accumulation pass.
    * Inputs carry a `rank` column and are already k-bounded (topKRanked),
    * so the fusion is a tiny-relation full outer join — candidate
    * generation is where the corpus-scale work already happened. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              k0: Int = 60, k: Int = 10,
              rankA: String = "rank_a", rankB: String = "rank_b"): DataFrame = {
    val fa = a.select(col(idCol), col("rank").as(rankA))
    val fb = b.select(col(idCol), col("rank").as(rankB))
    val fused = fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col(rankA).cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col(rankB).cast("double")),
            lit(0.0)))
    graft.ops.Ranking.topKRanked(fused, Seq("rrf" -> true, idCol -> false), k)
  }
}
