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
  /** ONE tokenize pass over the corpus: per doc (idCol, dl, query-term
    * token list). Tokenization is the per-row-expensive stage (normalize
    * regex + split), and the naive plan pays it once for the term
    * explode and AGAIN for the corpus-wide N/avgdl aggregate (and a
    * third time for a second scorer in the hybrid query) — checkpointing
    * the tiny (id, dl, hits) projection caps it at one pass however many
    * consumers score from it (guide §1.2 compute-once). The frame is
    * id + a long + ≤|queryTerms| short strings per doc; the pinned RDD
    * is released by the catalog-wide Leaks.sweep discipline. */
  private[graft] def queryTermBase(docs: DataFrame, idCol: String,
                                   textCol: String, queryTerms: Seq[String],
                                   checkpoint: Boolean = true): DataFrame = {
    val toks = TextOps.tokens(TextOps.normalizeText(col(textCol)))
    val base = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        filter(col("__toks"), t => t.isin(queryTerms: _*)).as("__q"))
    // checkpoint=false is the PlanSpec hook: the lazy plan shows the
    // term filter below the aggregation, which the checkpoint truncates
    if (checkpoint) base.localCheckpoint(false) else base
  }

  /** (doc, term, dl) term frequencies over query terms only, from a
    * [[queryTermBase]] frame — identical rows to the former
    * explode-then-filter form (filter-then-explode of the same array). */
  private[graft] def queryTermTf(base: DataFrame, idCol: String): DataFrame =
    base.select(col(idCol), col("dl"), explode(col("__q")).as("token"))
      .groupBy(col(idCol), col("token"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = queryTermBase(docs, idCol, textCol, queryTerms)
    bm25FromBase(base, idCol, k1, b)
  }

  /** BM25 scoring over a prepared [[queryTermBase]] frame (shared with
    * the hybrid RRF query so the corpus tokenizes once). */
  private[graft] def bm25FromBase(base: DataFrame, idCol: String,
                                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = queryTermTf(base, idCol)
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // N and avgdl over the WHOLE corpus (docs without query terms count)
    val corpus = base.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
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
    // ONE pass over the train grams (guide §1.2): the former plan
    // evaluated the expensive shingle explode TWICE (a semi-joined
    // contamination count and a separate total count, joined back);
    // a left join against the DISTINCT eval set preserves every train
    // gram exactly once, so one aggregate yields both counts.
    trainGrams
      .join(evalGrams.withColumn("__hit", lit(1)), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        count(col("__hit")).as("n_contaminated"))
      .select(col(idCol), col("n_ngrams"), col("n_contaminated"),
        (col("n_contaminated") /
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
