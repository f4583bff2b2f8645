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

  /** Predicted label per doc: argmax score, ties → label ASC. The
    * window partitions by document id — fully parallel. */
  def predict(m: Model, docs: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("s").desc, col("cand"))
    scores(m, docs, idCol, textCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cand").as("pred"))
  }

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
    val scored = TextOps.bigramLmScore(docs, docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cut = scored.agg(expr("percentile(avg_lp, 0.5)")).head().getDouble(0)
    val labeled = docs.join(
        scored.select(col(idCol),
          when(col("avg_lp") >= cut, "hq").otherwise("lq").as("gate_label")),
        Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = fit(labeled, idCol, textCol, "gate_label")
    labeled.select(col(idCol), col("gate_label"))
      .join(predict(m, labeled, idCol, textCol), Seq(idCol))
      .withColumnRenamed("pred", "pred_label")
      .groupBy("gate_label", "pred_label")
      .agg(count(lit(1)).as("n"))
  }
}
