package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** L8 — Gaussian naive Bayes, from scratch, sklearn-faithful.
  *
  * MLlib's `NaiveBayes(modelType="gaussian")` diverges measurably from
  * sklearn's `GaussianNB` on the reference's wine tournament (measured
  * ~0.372 vs the published 0.4515 five-fold mean — an 8-point gap, far
  * outside fold-RNG noise, while the tree models match within a point).
  * The reference's number is the sklearn algorithm, so the engine ships
  * the sklearn algorithm: per-class mean + BIASED per-class variance
  * (`np.var`, /n), class priors = empirical frequencies, and the exact
  * `var_smoothing` rule — every class variance gets
  * `varSmoothing · max_i Var_all(x_i)` added, where the max is over the
  * WHOLE training relation, not per class (sklearn's `GaussianNB.fit`,
  * epsilon_). Prediction = argmax_k [log π_k − ½Σ_i(log 2πσ²_ki +
  * (x_i−μ_ki)²/σ²_ki)], ties to the lowest label like `np.argmax`.
  *
  * Scale design: fit is ONE map-side-combined groupBy over the label —
  * 2d+1 moment aggregates per class, the only driver-side state is the
  * O(k·d) parameter table. Scoring is a generated Column expression over
  * literal parameters: no UDF, no broadcast join, stays inside
  * whole-stage codegen (k·d arithmetic nodes — wine: 7×12, trivially
  * within codegen limits).
  *
  * Ref: cross-validation/wine_analysis.py:81 (GaussianNB()),
  * assignment_report.md:158 (0.4515 ± 0.0121).
  */
object GaussianNb {

  case class GnbStats(label: Double, prior: Double,
                      mean: Array[Double], variance: Array[Double])

  /** Shared moment pass for both fit variants: ONE `rollup(label)`
    * aggregation produces the per-class rows AND the ungrouped global row
    * (grouping flag distinguishes them) — so the sklearn var_smoothing
    * epsilon always derives from a single distributed aggregate, never a
    * driver-side fold over class rows in collect() order. Returns
    * (per-class rows, global row). */
  private def momentRows(df: DataFrame, arrCol: String, labelCol: String,
                         d: Int, exact: Boolean): (Seq[Row], Row) = {
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    val moments = (0 until d).flatMap { i =>
      if (exact)
        Seq(sum(el(i).cast("long")).cast("double").as(s"s_$i"),
          sum((el(i) * el(i)).cast("long")).cast("double").as(s"ss_$i"))
      else
        Seq(sum(el(i)).as(s"s_$i"), sum(el(i) * el(i)).as(s"ss_$i"))
    } :+ count(lit(1)).cast("double").as("n") :+
      // max |x_i| rides along for the exact path's overflow guard (cheap
      // enough to always compute; one extra agg column)
      max((0 until d).map(i => abs(el(i)))
        .reduce((a, b) => greatest(a, b))).as("__maxabs") :+
      grouping(col("label")).cast("int").as("__g")
    val rows = df.select(col(labelCol).cast("double").as("label"), col(arrCol))
      .rollup("label").agg(moments.head, moments.tail: _*).collect()
    val (g, cls) = rows.partition(_.getAs[Int]("__g") == 1)
    (cls.toSeq, g.head)
  }

  private def statsFrom(cls: Seq[Row], g: Row, d: Int,
                        varSmoothing: Double): Seq[GnbStats] = {
    val total = g.getAs[Double]("n")
    // sklearn: epsilon = var_smoothing * max variance over ALL samples.
    val globalVar = (0 until d).map { i =>
      val s = g.getAs[Double](s"s_$i"); val ss = g.getAs[Double](s"ss_$i")
      math.max(ss / total - (s / total) * (s / total), 0.0)
    }
    val eps = varSmoothing * globalVar.max
    cls.map { r =>
      val n = r.getAs[Double]("n")
      val mean = Array.tabulate(d)(i => r.getAs[Double](s"s_$i") / n)
      val variance = Array.tabulate(d) { i =>
        math.max(r.getAs[Double](s"ss_$i") / n - mean(i) * mean(i), 0.0) + eps
      }
      GnbStats(r.getAs[Double]("label"), n / total, mean, variance)
    }.sortBy(_.label)
  }

  /** Fit over an `array<double>` feature column: one aggregation pass
    * producing per-class and global (n, Σx_i, Σx_i²) — biased variances +
    * the sklearn smoothing epsilon derived from the same moments. */
  def fitArray(df: DataFrame, arrCol: String, labelCol: String, d: Int,
               varSmoothing: Double = 1e-9): Seq[GnbStats] = {
    val (cls, g) = momentRows(df, arrCol, labelCol, d, exact = false)
    statsFrom(cls, g, d, varSmoothing)
  }

  /** Cross-engine-exact fit for INTEGER-VALUED feature doubles (quantize
    * first — floor(x·1e6 + 0.5), the int8/PQ discipline): moment sums
    * accumulate in BIGINT (order-independent and EXACT — x and x² of
    * quantized features are exact doubles, and int64 → double casts
    * round identically on every IEEE engine, unlike wide-DECIMAL →
    * double casts, where a two-step unscale measurably differs in the
    * last ulp). The global-variance moments come from the same rollup
    * pass (grouping-flagged global row), never a driver-side double fold.
    * Every derived parameter is then a fixed sequence of IEEE scalar ops
    * on bit-identical inputs, so a SQL oracle replaying the same formulas
    * reproduces the parameters bit-for-bit.
    *
    * ROW CEILING: Spark's non-ANSI BIGINT sum wraps silently on overflow
    * while DuckDB promotes to HUGEINT, so "exact" would silently diverge
    * past ~Long.MaxValue / max(x²) rows (~9.2M rows for features
    * quantized to ±1e6). The fit measures max|x| in the same pass and
    * REFUSES (IllegalArgumentException) rather than wrap — callers at
    * that scale must coarsen the quantization (1e6 → 1e3 buys 10⁶× more
    * rows) or shard the fit by class. */
  def fitArrayExact(df: DataFrame, arrCol: String, labelCol: String, d: Int,
                    varSmoothing: Double = 1e-9): Seq[GnbStats] = {
    val (cls, g) = momentRows(df, arrCol, labelCol, d, exact = true)
    val total = g.getAs[Double]("n")
    val maxAbs = g.getAs[Double]("__maxabs")
    val worst = total * math.max(maxAbs, maxAbs * maxAbs)
    require(worst < Long.MaxValue.toDouble * 0.98,
      s"fitArrayExact: BIGINT moment sums could overflow (n=$total, " +
        s"max|x|=$maxAbs => worst-case sum ~ $worst vs Long.MaxValue). " +
        "Coarsen the feature quantization or shard the fit.")
    statsFrom(cls, g, d, varSmoothing)
  }

  /** CV-melted exact fit: the fold dimension collapses into the grouping
    * key — ONE `groupBy(fold, label)` pass computes per-(fold, class)
    * BIGINT partials, and each held-out fold's train fit is the driver-side
    * Long re-sum over the other folds' partials. BIGINT addition is
    * associative and commutative, so the recombined moments are
    * bit-identical to `fitArrayExact`'s direct sums over the train rows
    * (and to a SQL oracle's fold-aware re-aggregation) — K fits for the
    * cost of one distributed aggregate instead of K rollup+collect round
    * trips. Same integer-valued-feature contract and overflow refusal as
    * `fitArrayExact` (guarded on the FULL relation, a superset of every
    * train split). Returns fold f -> stats fit on folds != f. */
  def fitCvExact(df: DataFrame, arrCol: String, labelCol: String,
                 foldCol: String, k: Int, d: Int,
                 varSmoothing: Double = 1e-9): IndexedSeq[Seq[GnbStats]] = {
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    val aggs = (0 until d).flatMap { i =>
      Seq(sum(el(i).cast("long")).as(s"s_$i"),
        sum((el(i) * el(i)).cast("long")).as(s"ss_$i"))
    } :+ count(lit(1)).as("n") :+
      max((0 until d).map(i => abs(el(i)))
        .reduce((a, b) => greatest(a, b))).as("__maxabs")
    val rows = df.select(col(foldCol).cast("int").as("__fold"),
        col(labelCol).cast("double").as("label"), col(arrCol))
      .groupBy("__fold", "label").agg(aggs.head, aggs.tail: _*).collect()
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val maxAbs = rows.map(_.getAs[Double]("__maxabs")).max
    val worst = totalN.toDouble * math.max(maxAbs, maxAbs * maxAbs)
    require(worst < Long.MaxValue.toDouble * 0.98,
      s"fitCvExact: BIGINT moment sums could overflow (n=$totalN, " +
        s"max|x|=$maxAbs => worst-case sum ~ $worst vs Long.MaxValue). " +
        "Coarsen the feature quantization or shard the fit.")
    (0 until k).map { f =>
      val train = rows.filter(_.getAs[Int]("__fold") != f)
      val byClass = train.groupBy(_.getAs[Double]("label")).toSeq
        .map { case (lbl, rs) =>
          (lbl, rs.map(_.getAs[Long]("n")).sum,
            Array.tabulate(d)(i => rs.map(_.getAs[Long](s"s_$i")).sum),
            Array.tabulate(d)(i => rs.map(_.getAs[Long](s"ss_$i")).sum))
        }
      val nTot = byClass.map(_._2).sum.toDouble
      // global (train-wide) moments = Long sums over the class partials;
      // identical to fitArrayExact's grouping-flagged global rollup row
      val gs = Array.tabulate(d)(i => byClass.map(_._3(i)).sum.toDouble)
      val gss = Array.tabulate(d)(i => byClass.map(_._4(i)).sum.toDouble)
      val globalVar = (0 until d).map { i =>
        math.max(gss(i) / nTot - (gs(i) / nTot) * (gs(i) / nTot), 0.0)
      }
      val eps = varSmoothing * globalVar.max
      byClass.map { case (lbl, nL, s, ss) =>
        val n = nL.toDouble
        val mean = Array.tabulate(d)(i => s(i).toDouble / n)
        val variance = Array.tabulate(d) { i =>
          math.max(ss(i).toDouble / n - mean(i) * mean(i), 0.0) + eps
        }
        GnbStats(lbl, n / nTot, mean, variance)
      }.sortBy(_.label)
    }
  }

  /** Generated argmax-of-log-likelihood expression: the per-class constant
    * (log prior − ½Σ log 2πσ²) folds to one literal; only the quadratic
    * term is per-row work. Argmax folds over (score, label) structs so
    * each score expression appears exactly once in the plan (the QDA
    * discipline); ties resolve to the lowest label. */
  /** Per-class log-likelihood score column (exposed so oracle-safety
    * audits can measure argmax margins on the same expression the
    * prediction uses). */
  def scoreExpr(cs: GnbStats, arrCol: String): Column = {
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    val d = cs.mean.length
    val const = math.log(cs.prior) -
      0.5 * (0 until d).map(i => math.log(2 * math.Pi * cs.variance(i))).sum
    val quad = (0 until d).map { i =>
      val diff = el(i) - lit(cs.mean(i))
      diff * diff * lit(1.0 / cs.variance(i))
    }.reduce(_ + _)
    lit(const) - quad * 0.5
  }

  def predictExpr(stats: Seq[GnbStats], arrCol: String): Column = {
    val arr = array(stats.map { cs =>
      struct(scoreExpr(cs, arrCol).as("s"), lit(cs.label).as("l"))
    }: _*)
    aggregate(arr, element_at(arr, 1),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
      .getField("l")
  }
}

/** MLlib-pipeline adapter so the registry / `Models.pipelineFor` can use
  * the sklearn-faithful NB as a drop-in `Estimator` (exposes `labelCol` /
  * `featuresCol` params under the standard names). */
class GaussianNbEstimator(override val uid: String)
    extends Estimator[GaussianNbModel] {
  def this() = this(Identifiable.randomUID("gnb"))

  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  final val varSmoothing = new Param[Double](this, "varSmoothing", "variance smoothing")
  setDefault(labelCol -> "label", featuresCol -> "features", varSmoothing -> 1e-9)

  override def fit(ds: Dataset[_]): GaussianNbModel = {
    val arr = ds.toDF().withColumn("__gnb_x", vector_to_array(col($(featuresCol))))
    val d = arr.select(size(col("__gnb_x"))).head().getInt(0)
    val stats = GaussianNb.fitArray(arr, "__gnb_x", $(labelCol), d, $(varSmoothing))
    val m = new GaussianNbModel(uid, stats)
    m.set(m.featuresCol, $(featuresCol))
    m
  }

  override def copy(extra: ParamMap): GaussianNbEstimator = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", DoubleType))
}

class GaussianNbModel(override val uid: String,
                      val stats: Seq[GaussianNb.GnbStats])
    extends Model[GaussianNbModel] {

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  setDefault(featuresCol -> "features")

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF()
      .withColumn("__gnb_x", vector_to_array(col($(featuresCol))))
      .withColumn("prediction", GaussianNb.predictExpr(stats, "__gnb_x"))
      .drop("__gnb_x")

  override def copy(extra: ParamMap): GaussianNbModel = {
    val m = new GaussianNbModel(uid, stats)
    copyValues(m, extra)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", DoubleType))
}
