package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L12 gap-closer — Optuna-style TPE (Tree-structured Parzen Estimator)
  * hyperparameter search (Bergstra et al., NeurIPS 2011), the adaptive
  * sampler the reference drives through Optuna
  * (teamProject/models/tree_models.py:100-204, models/ensemble.py:70-151).
  * Deterministic given a seed, unlike Optuna's default sampler — so search
  * traces are reproducible across runs and engines.
  *
  * The model-fitting inside each trial is distributed (MLlib); only the
  * O(nTrials) scalar history lives on the driver, matching how the
  * reference keeps the Optuna study driver-side.
  */
object Tpe {

  case class Trial(param: Double, score: Double)

  /** One TPE suggestion for a log10-uniform space [lo, hi], maximizing
    * score: split observed trials at the γ-quantile, Parzen-model the good
    * set l(x) and bad set g(x) with Gaussian kernels in log space, sample
    * candidates from l (plus a uniform exploration tail), return the
    * candidate maximizing l/g. */
  def suggest(trials: Seq[Trial], lo: Double, hi: Double,
              rng: scala.util.Random, gammaQ: Double = 0.25,
              nCandidates: Int = 24): Double = {
    val loL = math.log10(lo); val hiL = math.log10(hi)
    def uniform() = loL + (hiL - loL) * rng.nextDouble()
    if (trials.isEmpty) return math.pow(10, uniform())
    val sorted = trials.sortBy(t => (-t.score, t.param))
    val nGood = math.max(1, math.ceil(gammaQ * trials.size).toInt)
    val good = sorted.take(nGood).map(t => math.log10(t.param))
    val bad = sorted.drop(nGood).map(t => math.log10(t.param))
    val bw = math.max((hiL - loL) / 8.0, 1e-3)
    def dens(xs: Seq[Double], x: Double): Double =
      if (xs.isEmpty) 1.0 / (hiL - loL)
      else xs.map(m => math.exp(-0.5 * math.pow((x - m) / bw, 2))).sum /
        (xs.size * bw * math.sqrt(2 * math.Pi)) + 1e-12
    val cands = Seq.fill(nCandidates) {
      if (good.isEmpty || rng.nextDouble() < 0.2) uniform()
      else {
        val m = good(rng.nextInt(good.size))
        math.min(hiL, math.max(loL, m + bw * rng.nextGaussian()))
      }
    }
    math.pow(10, cands.maxBy(x => dens(good, x) / dens(bad, x)))
  }

  /** TPE search of LogisticRegression's regParam over log10-uniform
    * [1e-5, 1] — the C-sweep the reference runs by grid/Optuna
    * (experiments/overfitting_experiment.py:31-57). Same holdout protocol
    * as Models.randomSearchLr so the two are comparable head-to-head. */
  def tpeSearchLr(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  idCol: String, nTrials: Int, nInit: Int = 5,
                  seed: Long = 42L): Seq[Trial] = {
    val rng = new scala.util.Random(seed)
    val tagged = Split.tagHoldout(df, idCol, 0.25, seed = 42).cache()
    try {
      val train = tagged.filter(col("split") === "train")
      val test = tagged.filter(col("split") === "test")
      val history = scala.collection.mutable.ArrayBuffer.empty[Trial]
      for (t <- 0 until nTrials) {
        val param =
          if (t < nInit) math.pow(10, -5 + 5 * rng.nextDouble())
          else suggest(history.toSeq, 1e-5, 1.0, rng)
        val pipe = Models.pipelineFor(
          new LogisticRegression().setMaxIter(50).setRegParam(param),
          featureCols, labelCol)
        val acc = Models.evaluate(pipe.fit(train).transform(test), labelCol)
        history += Trial(param, acc)
      }
      history.toSeq
    } finally tagged.unpersist()
  }
}
