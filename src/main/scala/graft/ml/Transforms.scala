package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Num._

/** Gaussianizing transforms (SURVEY.md §2.7 M4/M5 — the reference's
  * PowerTransformer / QuantileTransformer, flagged "hard" in §7.4).
  *
  * Scale design: fitting never iterates over row data on the driver.
  * Yeo-Johnson evaluates the WHOLE λ grid in one aggregation pass (each λ
  * contributes two aggregate expressions); the quantile transformer fits
  * from one approx-quantile sketch pass. Only O(grid) / O(probes) scalars
  * reach the driver.
  */
object Transforms {

  /** Yeo-Johnson ψ(λ, x) as a Column expression. */
  def yeoJohnson(x: Column, lam: Double): Column = {
    val posBranch =
      if (math.abs(lam) < 1e-12) log(x + 1)
      else (pow(x + 1, lam) - 1) / lam
    val negBranch =
      if (math.abs(lam - 2) < 1e-12) -log(-x + 1)
      else -(pow(-x + 1, 2 - lam) - 1) / (2 - lam)
    when(x >= 0, posBranch).otherwise(negBranch)
  }

  /** ψ(λ, x) with λ as a COLUMN (the grid-explode fit path). Evaluates the
    * identical IEEE operation sequence as the per-λ static form, with the
    * λ=0 / λ=2 singular branches selected at runtime. */
  def yeoJohnsonDyn(x: Column, lam: Column): Column = {
    val posBranch = when(abs(lam) < 1e-12, log(x + 1))
      .otherwise((pow(x + 1, lam) - 1) / lam)
    val negBranch = when(abs(lam - 2) < 1e-12, -log(-x + 1))
      .otherwise(-(pow(-x + 1, lit(2) - lam) - 1) / (lit(2) - lam))
    when(x >= 0, posBranch).otherwise(negBranch)
  }

  /** M4 — fit λ per column by grid MLE in one scan.
    *
    * Log-likelihood (profile): −n/2·log σ̂²(ψ_λ) + (λ−1)·Σ sign(x)·log(|x|+1);
    * the second term is λ-independent up to the (λ−1) factor, so the scan
    * needs Σψ, Σψ² for every grid λ plus Σ sign(x)log(|x|+1) once.
    *
    * Plan shape: a k-col × |grid|-λ WIDE aggregate (2·k·|grid| expressions)
    * blows past `spark.sql.codegen.maxFields` and drops the whole pass to
    * interpreted mode (measured 8.5 s at sf0.1); instead the grid is
    * EXPLODED — (column, x) × (λ index, λ) rows through one small
    * codegen'd ψ — and partial aggregation collapses each partition to
    * k·|grid| groups map-side before a 2-row-per-group shuffle. Same scan
    * count (one), same per-row pow/log work, fully pipelined at any scale;
    * only O(k·|grid|) scalars reach the driver. */
  def fitYeoJohnson(df: DataFrame, cols: Seq[String],
                    grid: Seq[Double] = (-20 to 20).map(_ * 0.25)): Map[String, Double] = {
    val long = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("double").as("x"))): _*)).as("s"))
      .select(col("s.cname").as("cname"), col("s.x").as("x"))
      .filter(col("x").isNotNull)
    val lamArr = array(grid.map(lit): _*)
    val moments = long
      .select(col("cname"), col("x"), posexplode(lamArr).as(Seq("li", "lam")))
      .groupBy("cname", "li")
      .agg(sum(yeoJohnsonDyn(col("x"), col("lam"))).as("s"),
        sum(yeoJohnsonDyn(col("x"), col("lam")) *
          yeoJohnsonDyn(col("x"), col("lam"))).as("ss"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val base = long.groupBy("cname")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(signum(col("x")) * log(abs(col("x")) + 1)).as("slog"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    cols.map { c =>
      val (n, slog) = base(c)
      val best = grid.zipWithIndex.maxBy { case (lam, i) =>
        val (s, ss) = moments((c, i))
        val variance = ss / n - (s / n) * (s / n)
        if (variance <= 0 || variance.isNaN) Double.NegativeInfinity
        else -n / 2.0 * math.log(variance) + (lam - 1) * slog
      }
      c -> best._1
    }.toMap
  }

  /** Apply fitted λs (+ optional z-standardization of the output, matching
    * sklearn PowerTransformer(standardize=True)). */
  def applyYeoJohnson(df: DataFrame, lambdas: Map[String, Double],
                      standardize: Boolean = true): DataFrame = {
    val transformed = lambdas.foldLeft(df) { case (acc, (c, lam)) =>
      acc.withColumn(c, yeoJohnson(col(c), lam))
    }
    if (!standardize) transformed
    else {
      val fitted = Prep.fitStandardScaler(transformed, lambdas.keys.toSeq)
      Prep.standardScale(transformed, fitted, lambdas.keys.toSeq)
    }
  }

  /** M5 — quantile transformer: fit an empirical-CDF sketch per column
    * (approx quantiles at `nProbes` evenly spaced probabilities), then map
    * x → interpolated F(x) ∈ [0,1] ("uniform") or Φ⁻¹(F(x)) ("normal"). */
  case class QuantileModel(col: String, breaks: Array[Double])

  def fitQuantileTransformer(df: DataFrame, cols: Seq[String],
                             nProbes: Int = 101): Seq[QuantileModel] = {
    val probs = (0 until nProbes).map(_.toDouble / (nProbes - 1)).toArray
    val quantiles = df.stat.approxQuantile(cols.toArray, probs, 1e-4)
    cols.zip(quantiles).map { case (c, q) => QuantileModel(c, q) }.toSeq
  }

  /** Exact-percentile fit (one aggregation pass, `percentile` ≡ DuckDB's
    * QUANTILE_CONT) — the oracle-verifiable path; use the approx-sketch
    * variant above when breakpoint exactness doesn't matter. */
  def fitQuantileTransformerExact(df: DataFrame, cols: Seq[String],
                                  nProbes: Int = 101): Seq[QuantileModel] = {
    val probsSql = (0 until nProbes).map(_.toDouble / (nProbes - 1))
      .mkString("array(", ",", ")")
    val aggs = cols.map(c => expr(s"percentile(`$c`, $probsSql)").as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map(c => QuantileModel(c, row.getAs[Seq[Double]](c).toArray)).toSeq
  }

  /** Piecewise-linear empirical CDF lookup (binary search over the fitted
    * breakpoints — a closure, since a 100-way when-chain per column defeats
    * codegen). The segment is the LAST breakpoint ≤ x (deterministic under
    * duplicate breakpoints, unlike Arrays.binarySearch's arbitrary-match,
    * and reproducible as a count-of-breaks-≤-x in SQL). Clamped to
    * [ε, 1−ε] so the normal inverse stays finite. */
  def quantileTransform(model: QuantileModel, output: String = "uniform"): Column = {
    val breaks = model.breaks
    val eps = 1e-7
    val f = udf { (x: Double) =>
      val n = breaks.length
      val u =
        if (x <= breaks(0)) 0.0
        else if (x >= breaks(n - 1)) 1.0
        else {
          // last index with breaks(idx) <= x
          var lo = 0; var hi = n - 1
          while (lo < hi) {
            val m = (lo + hi + 1) >>> 1
            if (breaks(m) <= x) lo = m else hi = m - 1
          }
          val l = breaks(lo); val h = breaks(lo + 1)
          val frac = if (h > l) (x - l) / (h - l) else 0.0
          (lo + frac) / (n - 1)
        }
      val clamped = math.min(1 - eps, math.max(eps, u))
      if (output == "normal") inverseNormalCdf(clamped) else clamped
    }
    f(col(model.col))
  }

  def applyQuantileTransformer(df: DataFrame, models: Seq[QuantileModel],
                               output: String = "uniform"): DataFrame =
    models.foldLeft(df)((acc, m) =>
      acc.withColumn(m.col, quantileTransform(m, output)))

  /** Acklam's rational approximation of Φ⁻¹ (|ε| < 1.15e-9). */
  def inverseNormalCdf(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
      2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
      2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}
