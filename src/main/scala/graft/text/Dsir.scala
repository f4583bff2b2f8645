package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ml.Split

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): pick raw-corpus documents whose hashed n-gram statistics look
  * like a curated TARGET corpus. The standard pretraining-data selection
  * move when a quality classifier is too blunt: fit two bag-of-hashed-
  * n-grams multinomial models (target p̂, raw q̂), weight every raw doc by
  * its log importance ratio Σ_features [ln p̂(b) − ln q̂(b)], then Gumbel
  * top-k resample (equivalent to sampling without replacement with
  * probability ∝ the importance weight).
  *
  * Everything is relational and deterministic, so one DuckDB statement
  * replays the whole fit+select pipeline bit-for-bit:
  *
  *   features = hashed unigram+bigram stream — explode each doc's token
  *              array ONCE (the bigramLmScore materialization fix), md5
  *              bucket per feature; the exchange carries (id, bucket)
  *              pairs, never text;
  *   fit      = two B-row count aggregates over the full bucket domain,
  *              add-one smoothed; B is a constant, so the fitted
  *              log-ratio relation broadcasts at any corpus scale;
  *   weights  = broadcast-join the B-row model into the feature stream,
  *              per-doc DECIMAL(30,12) log-sum (order-independent — the
  *              q_x_lm_quality discipline);
  *   resample = Gumbel key logw + g(id) with g = −ln(−ln(u)) from the
  *              md5-uniform u (deterministic, engine-reproducible); the
  *              top-k is TakeOrderedAndProject (per-partition heaps + a
  *              k-row driver merge), never a global sort.
  *
  * At 100 TB: the only full-data passes are the feature explosion and its
  * two bucket-bounded aggregates; the model is O(B) rows; selection exits
  * the map side with k rows. The paper uses B = 10⁴ buckets — here B = 64
  * keeps the oracle's bucket join readable; the plan shape is identical
  * at any B because the model relation stays broadcast-size.
  */
object Dsir {

  /** Hashed feature-space size. A constant, not fitted: the log-ratio
    * relation has exactly this many rows. */
  val Buckets = 64

  /** md5 feature bucket — first 8 hex digits as an integer, mod B (the
    * q_x_feature_hash idiom; nibble-positional-sum on the oracle side). */
  def bucketOf(f: Column): Column =
    pmod(conv(substring(md5(f), 1, 8), 16, 10).cast("long"), lit(Buckets))

  /** Hashed unigram+bigram feature stream: one (id, bucket) row per
    * feature occurrence. The token array is materialized as a column
    * BEFORE the bigram lambda — Spark does not eliminate common
    * subexpressions across a lambda boundary, so indexing the raw split()
    * would re-run the regex per element (the measured O(len²) trap). */
  def features(df: DataFrame, idCol: String, textCol: String,
               keep: Seq[String] = Nil): DataFrame = {
    val keyCols = col(idCol) +: keep.map(col)
    val base = df.select(keyCols :+
      TextOps.tokens(TextOps.normalizeText(col(textCol))).as("__t"): _*)
    val unis = base.select(keyCols :+ explode(col("__t")).as("f"): _*)
    val bis = base.select(keyCols :+
      explode(TextOps.bigramsOf(col("__t"))).as("f"): _*)
    unis.unionByName(bis)
      .select(keyCols :+ bucketOf(col("f")).as("bucket"): _*)
  }

  /** logRatios over PREBUILT feature streams — the one-tokenization-pass
    * form: callers materialize `features(corpus, …, keep = Seq(src))`
    * once and slice the target out of it, so the corpus text is read and
    * tokenized exactly once no matter how many stages consume it. */
  def logRatiosOf(targetFeats: DataFrame, rawFeats: DataFrame): DataFrame =
    logRatiosOfCounts(
      targetFeats.select(col("bucket"), lit(1L).as("cnt")),
      rawFeats.select(col("bucket"), lit(1L).as("cnt")))

  /** As [[logRatiosOf]], over pre-counted (bucket, cnt) streams — the
    * per-doc-histogram form: a caller that caches (id, bucket, cnt)
    * instead of the exploded per-occurrence stream feeds the bucket
    * totals here as Σcnt (identical integers). */
  def logRatiosOfCounts(targetFeats: DataFrame, rawFeats: DataFrame): DataFrame = {
    val spark = targetFeats.sparkSession
    def bucketCounts(f: DataFrame, n: String) =
      f.groupBy("bucket").agg(sum(col("cnt")).as(n))
    val ct = bucketCounts(targetFeats, "ct")
    val cr = bucketCounts(rawFeats, "cr")
    val nt = ct.agg(sum("ct").as("nt"))
    val nr = cr.agg(sum("cr").as("nr"))
    val dom = spark.range(Buckets).select(col("id").as("bucket"))
    dom.join(ct, Seq("bucket"), "left").join(cr, Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("bucket"),
        (decLog((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("nt") + Buckets).cast("double")) -
          decLog((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
            (col("nr") + Buckets).cast("double"))).as("lr"))
  }

  private def decLog(x: Column): Column = log(x).cast(DecimalType(30, 12))

  /** The fitted importance model: B rows (bucket, lr) with
    * lr = ln p̂_target(b) − ln p̂_raw(b), each an add-one-smoothed
    * multinomial ln((c_b+1)/(N+B)). Built over the FULL bucket domain so
    * zero-count buckets still carry their smoothed ratio. Both ln inputs
    * are exact integer ratios → bit-identical doubles on any engine; the
    * DECIMAL(30,12) cast pins the stored coefficient. */
  def logRatios(target: DataFrame, raw: DataFrame,
                idCol: String, textCol: String): DataFrame =
    logRatiosOf(features(target, idCol, textCol),
      features(raw, idCol, textCol))

  /** Per-doc importance weight: (id, n_feats, logw) with logw the exact
    * DECIMAL sum of the doc's per-feature log ratios. Broadcast model
    * join + one shuffle on id with map-side partials. */
  def importanceWeightsOf(rawFeats: DataFrame, model: DataFrame,
                          idCol: String): DataFrame =
    rawFeats
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("lr").as("logw"))

  def importanceWeights(raw: DataFrame, model: DataFrame,
                        idCol: String, textCol: String): DataFrame =
    importanceWeightsOf(features(raw, idCol, textCol), model, idCol)

  /** Gumbel top-k importance resample: key = logw + g(id), where
    * g = −ln(−ln(u)) and u ∈ (0,1) is md5-uniform in the doc id — the
    * Gumbel-max trick makes the deterministic top-k BY KEY a sample
    * without replacement with P ∝ exp(logw). u = (h+0.5)/2³² never hits
    * 0 or 1, and −ln(u) ≥ 1.16e-10 survives the 12-decimal rounding, so
    * both ln calls are total. Keys stay DECIMAL through the arithmetic
    * (the precision-shed discipline below), but the top-k SELECTION
    * compares the DOUBLE image of the key, doc_id tiebreak: the one
    * cross-engine residual here is that ln is not correctly rounded, so
    * a decimal key can differ between engines in its last place (one
    * gkey of 500k at sf10) — the double image collapses a last-place
    * wobble whenever |gkey| is large enough that the 1e-12 sits below
    * the double's ulp, and the doc_id tiebreak then keeps both engines'
    * k-boundary membership aligned. Comparing the exact decimals would
    * re-expose every such wobble at the boundary. */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
               textCol: String, k: Int, seed: Int = 77): DataFrame = {
    // The raw feature stream feeds BOTH the model's raw counts and the
    // per-doc weights — persist it so the corpus is tokenized once, not
    // twice (at 100 TB the explosion pass dominates everything else).
    val rawFeats = features(raw, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = logRatiosOf(features(target, idCol, textCol), rawFeats)
    val w = importanceWeightsOf(rawFeats, model, idCol)
    val h = conv(substring(Split.hashKey(col(idCol), seed), 1, 8), 16, 10)
      .cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    val v = (-log(u)).cast(DecimalType(30, 12))
    val g = (-log(v.cast("double"))).cast(DecimalType(30, 12))
    // Narrow logw (the SUM widened it to DECIMAL(38,12)) before the add:
    // Spark's decimal-addition result precision would exceed 38 and
    // silently SHED the 12th decimal (scale 11) — measured as a 4e-12
    // cross-engine drift. (30,12)+(30,12) → (31,12), lossless.
    // k rows out vs a corpus-sized cached feature stream in: materialize
    // the selection and release rawFeats NOW (library-call persist
    // discipline — Leaks.releasing) instead of leaking it into the session.
    graft.ops.Leaks.releasing(
      w.withColumn("gkey", col("logw").cast(DecimalType(30, 12)) + g)
        .orderBy(col("gkey").cast("double").desc, col(idCol))
        .limit(k),
      rawFeats)
  }
}
