package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Elastic-net linear regression by cyclic coordinate descent (Friedman
  * et al. 2010, the glmnet algorithm), hash-exact:
  *
  *   - ONE distributed moment pass: n, Σx_j, Σy, Σx_jx_k, Σx_jy — all
  *     accumulated in DECIMAL (order-independent, the A15 corr-matrix
  *     shape: O(d²) aggregate expressions, no second data pass ever);
  *   - everything after is a FIXED, UNROLLED sequence of IEEE double
  *     ops on those exact moments — centered Gram entries, then
  *     `sweeps` cyclic passes of the soft-threshold update
  *        β_j ← S(ρ_j, n·λα) / (C_jj + n·λ(1−α)),
  *        ρ_j = Cxy_j − Σ_{k≠j} C_jk β_k  (ascending k, left-assoc)
  *     — the same op order the SQL oracle spells out CTE by CTE, so the
  *     coefficient path replays bit-for-bit. No randomness, no data-
  *     dependent iteration counts, no line search.
  *
  * Determinism beats closed-form here: the normal-equation solve would
  * need a matrix inverse (pivot-order-sensitive); cyclic CD is a pure
  * expression DAG. `sweeps` is fixed (geometric convergence on a
  * standardized-ish Gram); at 100 TB the cost is the ONE moment pass —
  * the driver math is O(path·sweeps·d²) scalars.
  */
object ElasticNet {

  /** One fitted path point. */
  case class Fit(lambda: Double, alpha: Double, intercept: Double,
                 betas: Array[Double])

  /** Exact moments of (X, y): collected once, reused for every path
    * point. `xs(j)` must be deterministic double expressions. */
  case class Moments(n: Double, sx: Array[Double], sy: Double,
                     sxx: Array[Array[Double]], sxy: Array[Double])

  /** Moment accumulation is over INTEGER-valued feature doubles (the
    * frame()'s 1e6-quantized embeddings): every per-row product x_jx_k /
    * x_jy is an exact integer double (bounded ≪ 2^53), and the
    * DECIMAL(38,0) accumulator never rounds — so unlike a
    * fractional-decimal cast there is no half-tie to diverge on. The
    * O(1) final decimal→double conversions are Spark-side correct and
    * VARCHAR-parsed on the oracle side (exactDecimalCasts). */
  def moments(df: DataFrame, arrCol: String, labelCol: String,
              d: Int): Moments = {
    def x(j: Int) = element_at(col(arrCol), j + 1).cast("double")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 0))).cast("double")
    val y = col(labelCol).cast("double")
    val aggs =
      Seq(count(lit(1)).cast("double").as("n"), dsum(y).as("sy")) ++
        (0 until d).map(j => dsum(x(j)).as(s"sx$j")) ++
        (0 until d).map(j => dsum(x(j) * y).as(s"sxy$j")) ++
        (for (j <- 0 until d; k <- j until d)
          yield dsum(x(j) * x(k)).as(s"sxx${j}_$k"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val sxx = Array.tabulate(d, d)((j, k) =>
      r.getAs[Double](s"sxx${math.min(j, k)}_${math.max(j, k)}"))
    Moments(r.getAs[Double]("n"),
      Array.tabulate(d)(j => r.getAs[Double](s"sx$j")),
      r.getAs[Double]("sy"), sxx,
      Array.tabulate(d)(j => r.getAs[Double](s"sxy$j")))
  }

  /** Cyclic CD from β = 0 on the centered problem. The op order here is
    * the oracle's contract — change one association and the hash moves. */
  def fitFromMoments(m: Moments, lambda: Double, alpha: Double,
                     sweeps: Int): Fit = {
    val d = m.sx.length
    val cxx = Array.tabulate(d, d)((j, k) =>
      m.sxx(j)(k) - m.sx(j) * m.sx(k) / m.n)
    val cxy = Array.tabulate(d)(j => m.sxy(j) - m.sx(j) * m.sy / m.n)
    val l1 = m.n * lambda * alpha
    val l2 = m.n * lambda * (1.0 - alpha)
    val beta = Array.fill(d)(0.0)
    for (_ <- 1 to sweeps; j <- 0 until d) {
      var rho = cxy(j)
      for (k <- 0 until d if k != j) rho -= cxx(j)(k) * beta(k)
      val z = cxx(j)(j) + l2
      beta(j) =
        if (rho > l1) (rho - l1) / z
        else if (rho < -l1) (rho + l1) / z
        else 0.0
    }
    var icpt = m.sy / m.n
    for (j <- 0 until d) icpt -= m.sx(j) / m.n * beta(j)
    Fit(lambda, alpha, icpt, beta)
  }

  /** The coefficient path: one moment pass, `lambdas.size` CD runs. */
  def path(df: DataFrame, arrCol: String, labelCol: String, d: Int,
           lambdas: Seq[Double], alpha: Double = 0.5,
           sweeps: Int = 5): Seq[Fit] = {
    val m = moments(df, arrCol, labelCol, d)
    lambdas.map(l => fitFromMoments(m, l, alpha, sweeps))
  }
}
