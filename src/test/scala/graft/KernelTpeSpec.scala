package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Kernel, Models, Split, Tpe}

/** Gap-closer tests: RFF rbf-SVM must beat a linear SVM on a radially-
  * separable problem, and TPE must concentrate trials where scores are
  * high while staying deterministic. */
class KernelTpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Concentric-circles data: label = inside/outside radius — the classic
    * problem a LINEAR decision boundary cannot cut but rbf can. */
  def circles(n: Int = 1200) = {
    val u = (c: Int) => Split.hashUniform(concat_ws("#", col("id"), lit(c)), 11)
    spark.range(n).select(col("id"),
        (u(0) * 4.0 - 2.0).as("x"), (u(1) * 4.0 - 2.0).as("y"))
      .withColumn("label",
        when(col("x") * col("x") + col("y") * col("y") < 1.2, 1.0).otherwise(0.0))
  }

  test("RFF rbf-SVM separates circles where LinearSVC cannot") {
    val df = circles().cache()
    val tagged = Split.tagHoldout(df, "id", 0.3, seed = 5)
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")

    val linear = Models.pipelineFor(
      new org.apache.spark.ml.classification.LinearSVC().setMaxIter(50),
      Seq("x", "y"), "label")
    val accLinear = Models.evaluate(linear.fit(train).transform(test), "label")

    val rbf = Kernel.rbfSvmFit(train, Seq("x", "y"), "label",
      numFeatures = 128, gamma = 1.0)
    val accRbf = Models.evaluate(rbf.transform(test), "label")

    info(s"linear=$accLinear rbf=$accRbf")
    assert(accRbf > 0.9, s"rbf-SVM should separate circles, got $accRbf")
    assert(accRbf > accLinear + 0.15,
      s"rbf ($accRbf) should clearly beat linear ($accLinear)")
  }

  test("RFF map is deterministic and kernel-shaped") {
    // z(x)·z(x) ≈ k(x,x) = 1 for any x
    val df = circles(50)
    val z = df.select(Kernel.rffExpr(Seq("x", "y"), 256, 1.0).as("z"))
      .select(aggregate(transform(col("z"), v => v * v),
        lit(0.0), (a, v) => a + v).as("k"))
      .collect().map(_.getDouble(0))
    z.foreach(k => assert(math.abs(k - 1.0) < 0.35, s"z·z=$k far from 1"))
  }

  test("TPE suggestions concentrate near the good region, deterministically") {
    // synthetic history: score peaks at param 1e-2 (log10 = -2)
    val hist = Seq(-4.5, -4.0, -3.5, -3.0, -2.5, -2.1, -1.9, -1.5, -1.0, -0.5)
      .map(l => Tpe.Trial(math.pow(10, l), 1.0 - math.abs(l + 2.0)))
    val rng1 = new scala.util.Random(9)
    val s1 = Seq.fill(20)(Tpe.suggest(hist, 1e-5, 1.0, rng1))
    val rng2 = new scala.util.Random(9)
    val s2 = Seq.fill(20)(Tpe.suggest(hist, 1e-5, 1.0, rng2))
    assert(s1 == s2, "TPE must be deterministic given a seed")
    val near = s1.count(p => math.abs(math.log10(p) + 2.0) < 1.0)
    info(s"${near}/20 suggestions within 1 decade of the optimum")
    assert(near >= 14, s"only $near/20 suggestions near the optimum")
    assert(s1.forall(p => p >= 1e-5 && p <= 1.0))
  }

  test("GBT validation split stops boosting before maxIter on easy data") {
    val u = (c: Int) => Split.hashUniform(concat_ws("#", col("id"), lit(c)), 13)
    val df = spark.range(800).select(col("id"),
        pmod(col("id"), lit(2)).cast("double").as("y"),
        (pmod(col("id"), lit(2)) * 3.0 + u(0)).as("f0"),
        (pmod(col("id"), lit(2)) * -2.0 + u(1)).as("f1"))
      .cache()
    // on separable data the validation log-loss keeps improving RELATIVELY
    // (the stop rule is improvement < tol·max(err, 0.01)), so a meaningful
    // tol is coarser than MLlib's 0.01 default
    val (fitted, trees) = Models.fitGbtWithValidation(
      df, Seq("f0", "f1"), "y", "id", maxIter = 80, tol = 0.1)
    info(s"stopped at $trees/80 trees")
    assert(trees < 80, s"expected early stop, grew all $trees trees")
    assert(Models.evaluate(fitted.transform(df), "y") > 0.9)
    df.unpersist()
  }

  test("TPE search runs end-to-end and finds a competitive regParam") {
    val u = (c: Int) => Split.hashUniform(concat_ws("#", col("id"), lit(c)), 7)
    val df = spark.range(600).select(col("id"),
        pmod(col("id"), lit(2)).cast("double").as("y"),
        (pmod(col("id"), lit(2)) * 2.0 + u(0)).as("f0"),
        (pmod(col("id"), lit(2)) * -1.0 + u(1)).as("f1"))
      .cache()
    val trials = Tpe.tpeSearchLr(df, Seq("f0", "f1"), "y", "id",
      nTrials = 6, nInit = 3)
    assert(trials.size == 6)
    assert(trials.map(_.score).max > 0.9)
    df.unpersist()
  }
}
