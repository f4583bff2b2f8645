package graft.ml

import org.apache.spark.ml.classification.{LinearSVC, LinearSVCModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L7 gap-closer — rbf-kernel SVM for Spark, via Random Fourier Features
  * (Rahimi & Recht, "Random Features for Large-Scale Kernel Machines",
  * NeurIPS 2007): z(x) = sqrt(2/D)·[cos(wᵢ·x + bᵢ)] with wᵢ ~ N(0, 2γI),
  * bᵢ ~ U[0, 2π], so z(x)·z(y) ≈ exp(−γ‖x−y‖²) — the rbf kernel — and a
  * LINEAR SVM on z approximates sklearn's SVC(kernel='rbf')
  * (reference site: teamProject/svm_single_model.py; wine_analysis.py:80).
  *
  * This is the 100 TB-shaped choice: exact kernel SVMs need the n×n Gram
  * matrix (quadratic, undistributable), while RFF is a narrow per-row map
  * followed by MLlib's distributed LinearSVC. The (w, b) matrix is tiny
  * (D·d doubles), generated driver-side from a seed and closed over by the
  * feature UDF — never a shuffle, never driver row data.
  */
object Kernel {

  /** Deterministic N(0,1) draws via Box-Muller on a seeded RNG. */
  private def gaussians(rng: scala.util.Random, n: Int): Array[Double] =
    Array.fill(n) {
      val u1 = math.max(rng.nextDouble(), 1e-12); val u2 = rng.nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }

  /** The RFF map as a column: Array[Double] features → Array[Double] of
    * length `numFeatures`. w scale sqrt(2γ) gives kernel exp(−γ‖x−y‖²). */
  def rffExpr(featureCols: Seq[String], numFeatures: Int, gamma: Double,
              seed: Long = 42L): Column = {
    val d = featureCols.size
    val rng = new scala.util.Random(seed)
    val w = Array.fill(numFeatures)(gaussians(rng, d).map(_ * math.sqrt(2.0 * gamma)))
    val b = Array.fill(numFeatures)(rng.nextDouble() * 2.0 * math.Pi)
    val scale = math.sqrt(2.0 / numFeatures)
    val f = udf { (xs: Seq[Double]) =>
      val out = new Array[Double](numFeatures)
      var i = 0
      while (i < numFeatures) {
        val wi = w(i)
        var dot = b(i)
        var j = 0
        while (j < d) { dot += wi(j) * xs(j); j += 1 }
        out(i) = scale * math.cos(dot)
        i += 1
      }
      out
    }
    f(array(featureCols.map(c => col(c).cast("double")): _*))
  }

  case class RbfSvmModel(svc: LinearSVCModel, featureCols: Seq[String],
                         numFeatures: Int, gamma: Double, seed: Long) {
    def transform(df: DataFrame): DataFrame =
      svc.transform(df.withColumn("__rff",
        array_to_vector(rffExpr(featureCols, numFeatures, gamma, seed))))
  }

  /** Fit rbf-SVM ≈ RFF + LinearSVC. `numFeatures` trades kernel-approx
    * fidelity for cost (D=128 ≈ sklearn-comparable accuracy on low-dim
    * data; the map cost is O(D·d) per row, embarrassingly parallel). */
  def rbfSvmFit(train: DataFrame, featureCols: Seq[String], labelCol: String,
                numFeatures: Int = 128, gamma: Double = 0.5,
                regParam: Double = 1e-3, maxIter: Int = 50,
                seed: Long = 42L): RbfSvmModel = {
    val mapped = train.withColumn("__rff",
      array_to_vector(rffExpr(featureCols, numFeatures, gamma, seed)))
    val svc = new LinearSVC().setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol(labelCol).setFeaturesCol("__rff")
      .fit(mapped)
    RbfSvmModel(svc, featureCols, numFeatures, gamma, seed)
  }
}
