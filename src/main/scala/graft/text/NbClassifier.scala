package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Num

/** Multinomial naive-Bayes TEXT classifier over token counts — the
  * fastText-shaped quality/domain classifier of large-scale pipeline
  * cleaning (GPT-3 trained an LR classifier on WebText-vs-CommonCrawl;
  * CCNet distills its perplexity gate the same way). Fully relational:
  *
  *   fit   = ONE (label, word) count aggregation + three tiny rollups
  *           (per-label token totals, vocabulary size, label priors) —
  *           all vocabulary- or label-bounded, map-side combined;
  *   score = explode doc tokens once, broadcast-join the fitted count
  *           relation, one per-(doc, label) DECIMAL(30,12) log-sum —
  *           the bigramLmScore/BM25 term-join shape; the exchange
  *           carries (doc, word) keys, never document text.
  *
  * Determinism: add-one-smoothed log-likelihoods ln((c+1)/(n_l+V)) have
  * exact-integer-ratio inputs, so the doubles are bit-identical on any
  * engine; DECIMAL accumulation makes the per-doc sums order-independent
  * (the q_x_lm_quality discipline); argmax ties break on label ASC.
  * That makes the whole train→score→confusion pipeline hash-exact
  * against a single-threaded SQL oracle.
  */
object NbClassifier {

  /** Fitted state as relations (nothing driver-side): `counts` is the
    * (label, w, c) table, `totals` (label, n) token totals, `priors`
    * (label, d) document counts, `vocab`/`docs` one-row scalars. All
    * small enough to broadcast at any corpus scale (vocabulary- and
    * label-bounded). */
  final case class Model(counts: DataFrame, totals: DataFrame,
                         priors: DataFrame, vocab: DataFrame,
                         docs: DataFrame, labels: DataFrame)

  private def tokensOf(textCol: String): Column =
    TextOps.tokens(TextOps.normalizeText(col(textCol)))

  /** Fit on a labeled corpus: one token-explosion aggregation pass.
    * Each fitted relation carries DISTINCT column names (cl/tl/pl for
    * the label key, cw for the word key) — the relations share the same
    * source lineage, so same-named keys would trip Spark's ambiguous-
    * self-join analyzer when scoring joins them back together. */
  def fit(labeled: DataFrame, idCol: String, textCol: String,
          labelCol: String): Model = {
    val tok = labeled.select(col(labelCol).as("label"),
      explode(tokensOf(textCol)).as("w"))
    val counts = tok.groupBy("label", "w").agg(count(lit(1)).as("c"))
      .select(col("label").as("cl"), col("w").as("cw"), col("c"))
    val totals = tok.groupBy("label").agg(count(lit(1)).as("n"))
      .select(col("label").as("tl"), col("n"))
    val vocab = tok.select(countDistinct("w").as("v"))
    val priors = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("d"))
      .select(col("label").as("pl"), col("d"))
    val docsN = labeled.select(count(lit(1)).as("dn"))
    val labels = labeled.select(col(labelCol).as("cand")).distinct()
    Model(counts, totals, priors, vocab, docsN, labels)
  }

  /** Per-(doc, candidate-label) posterior log-score as an exact DECIMAL
    * column `s`: Σ_tokens ln((c+1)/(n_l+V)) + ln(d_l/D). */
  def scores(m: Model, docs: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokensOf(textCol)).as("w"))
    toks
      .crossJoin(broadcast(m.labels))
      .join(broadcast(m.counts),
        col("cand") === col("cl") && col("w") === col("cw"), "left")
      .join(broadcast(m.totals), col("cand") === col("tl"))
      .crossJoin(broadcast(m.vocab))
      .groupBy(col(idCol), col("cand"))
      .agg(sum(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n") + col("v")).cast("double"))
        .cast(DecimalType(30, 12))).as("lls"))
      .join(broadcast(m.priors), col("cand") === col("pl"))
      .crossJoin(broadcast(m.docs))
      .select(col(idCol), col("cand"),
        (col("lls") + log(col("d").cast("double") / col("dn").cast("double"))
          .cast(DecimalType(30, 12))).as("s"))
  }

  /** A [[Model]] compiled for scoring: ONE broadcastable per-word
    * relation with a log-likelihood column per label, plus the
    * label-bounded scalars (collected — fitted parameters, not row
    * data). The per-label ln's stay SPARK expressions built from those
    * scalars, so constant folding evaluates them with the same
    * StrictMath the relational path uses — bit-identical scores.
    * Scoring becomes a single token-explosion pass with one broadcast
    * join: no per-label row duplication, and none of the relational
    * path's broadcast-build job cascade (measured: ~7 of the warm
    * gate's 20 jobs were tiny broadcast builds, and at ~0.1 s scheduler
    * latency per job those dominated the wall). */
  final case class Compiled(labels: Seq[String], wordLls: DataFrame,
                            nvs: Seq[Long], priors: Seq[(Long, Long)])

  def compile(m: Model): Compiled = {
    val labs = m.labels.collect().map(_.getString(0)).sorted
    val nMap = m.totals.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = m.vocab.head().getLong(0)
    val dMap = m.priors.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dn = m.docs.head().getLong(0)
    val cCols = labs.zipWithIndex.map { case (l, i) =>
      max(when(col("cl") === l, col("c"))).as(s"c_$i") }
    val llCols = labs.indices.map { i =>
      log((coalesce(col(s"c_$i"), lit(0L)) + 1).cast("double")
        / lit(nMap(labs(i)) + v).cast("double")).as(s"ll_$i") }
    val wordLls = m.counts.groupBy(col("cw").as("w"))
      .agg(cCols.head, cCols.tail: _*)
      .select((col("w") +: llCols): _*)
    Compiled(labs, wordLls, labs.map(l => nMap(l) + v),
      labs.map(l => (dMap(l), dn)))
  }

  /** Per-doc score columns s_0..s_k (DECIMAL, one per label in
    * [[Compiled]] label order) in one pass: explode tokens, ONE
    * broadcast join, per-label decimal log-sums in the same aggregate.
    * Unseen words fall back to ln(1/(n_l+V)) — exactly the relational
    * path's coalesce(c, 0). */
  def scoresWide(c: Compiled, docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokensOf(textCol)).as("w"))
    val sumCols = c.labels.indices.map { i =>
      val dflt = log(lit(1L).cast("double") / lit(c.nvs(i)).cast("double"))
      sum(coalesce(col(s"ll_$i"), dflt).cast(DecimalType(30, 12)))
        .as(s"lls_$i") }
    toks.join(broadcast(c.wordLls), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col(idCol) +: c.labels.indices.map { i =>
        val (dl, dn) = c.priors(i)
        (col(s"lls_$i") +
          log(lit(dl).cast("double") / lit(dn).cast("double"))
            .cast(DecimalType(30, 12))).as(s"s_$i") }: _*)
  }

  /** Argmax over the wide scores: least over struct(−s, label) is
    * (score DESC, label ASC) as a scalar projection — no window, no
    * second aggregate. */
  def predictCompiled(c: Compiled, docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val structs = c.labels.indices.map(i =>
      struct((col(s"s_$i") * -1).as("ns"), lit(c.labels(i)).as("cand")))
    scoresWide(c, docs, idCol, textCol)
      .select(col(idCol),
        (if (structs.size == 1) structs.head else least(structs: _*))
          .getField("cand").as("pred"))
  }

  /** Predicted label per doc: argmax score, ties → label ASC. Compiles
    * the model (a few label-bounded collects) and runs the single-pass
    * scorer; callers that score repeatedly should [[compile]] once. */
  def predict(m: Model, docs: DataFrame, idCol: String,
              textCol: String): DataFrame =
    predictCompiled(compile(m), docs, idCol, textCol)

  /** The CCNet/GPT-3 distillation move in one call: gate the corpus
    * with the statistical LM quality score (median split of
    * [[TextOps.bigramLmScore]]'s avg_lp — exact percentile so the label
    * assignment is replayable; at 100 TB the gate itself would be
    * approx_percentile, see CorpusBuild), fit the NB classifier on
    * those labels, and report its confusion against the gate. The
    * classifier is what production then RUNS (one broadcast-join map
    * pass) instead of re-fitting the LM on every shard. */
  def distillLmGate(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val labeled = docs.join(lmGateLabels(docs, idCol, textCol), Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = fit(labeled, idCol, textCol, "gate_label")
    confusion(m, labeled.select(col(idCol), col("gate_label")),
      docs, idCol, textCol)
  }

  /** The TEACHER pass of [[distillLmGate]]: per-doc LM gate labels
    * (idCol, gate_label) from the median split of the corpus-fitted
    * bigram LM — split out so the query layer can pin it as shared
    * fitted state (the LM fit is the expensive half of the
    * distillation). */
  def lmGateLabels(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val scored = TextOps.bigramLmScore(docs, docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cut = scored.agg(expr("percentile(avg_lp, 0.5)")).head().getDouble(0)
    scored.select(col(idCol),
      when(col("avg_lp") >= cut, "hq").otherwise("lq").as("gate_label"))
  }

  /** The ONE corpus-pass relation of [[fit]]: the (label, word) token
    * counts — the other pinnable half of the distillation. */
  def tokenCounts(labeled: DataFrame, textCol: String,
                  labelCol: String): DataFrame =
    labeled.select(col(labelCol).as("label"),
        explode(tokensOf(textCol)).as("w"))
      .groupBy("label", "w").agg(count(lit(1)).as("c"))
      .select(col("label").as("cl"), col("w").as("cw"), col("c"))

  /** Rebuild a [[Model]] from (possibly pinned) fitted relations: the
    * token-count table plus the per-doc label relation. Everything else
    * is a vocabulary- or label-bounded derivation, value-identical to
    * what [[fit]] computes from the raw corpus. */
  def modelFrom(counts: DataFrame, docLabels: DataFrame,
                labelCol: String): Model = {
    val totals = counts.groupBy(col("cl").as("tl")).agg(sum("c").as("n"))
    val vocab = counts.select(countDistinct("cw").as("v"))
    val priors = docLabels.groupBy(col(labelCol).as("pl"))
      .agg(count(lit(1)).as("d"))
    val docsN = docLabels.select(count(lit(1)).as("dn"))
    val labels = docLabels.select(col(labelCol).as("cand")).distinct()
    Model(counts, totals, priors, vocab, docsN, labels)
  }

  /** Gate-vs-student confusion: score `docs` with the fitted model and
    * cross-tabulate against the gate labels. */
  def confusion(m: Model, gateLabels: DataFrame, docs: DataFrame,
                idCol: String, textCol: String): DataFrame =
    confusion(compile(m), gateLabels, docs, idCol, textCol)

  def confusion(c: Compiled, gateLabels: DataFrame, docs: DataFrame,
                idCol: String, textCol: String): DataFrame =
    gateLabels
      .join(predictCompiled(c, docs, idCol, textCol), Seq(idCol))
      .withColumnRenamed("pred", "pred_label")
      .groupBy("gate_label", "pred_label")
      .agg(count(lit(1)).as("n"))
}
