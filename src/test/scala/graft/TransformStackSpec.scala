package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Models, Split, Stacking, Transforms}

class TransformStackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("yeo-johnson: λ≈1 leaves near-gaussian data alone, skewed data gets λ<1") {
    // symmetric data around 0 → λ ≈ 1 (identity-ish)
    val sym = (1 to 2000).map(i => Split.hashUniform(lit(i), 3)).toArray
    val symDf = spark.range(1, 2001)
      .select((Split.hashUniform(col("id"), 3) - 0.5).as("x"))
    val lamSym = Transforms.fitYeoJohnson(symDf, Seq("x"))("x")
    info(s"λ(symmetric) = $lamSym")
    assert(lamSym > 0.5 && lamSym < 1.6)

    // right-skewed data (exp of uniform) → λ well below 1
    val skewDf = spark.range(1, 2001)
      .select(exp(Split.hashUniform(col("id"), 5) * 4.0).as("x"))
    val lamSkew = Transforms.fitYeoJohnson(skewDf, Seq("x"))("x")
    info(s"λ(right-skewed) = $lamSkew")
    assert(lamSkew < 0.5)

    // transform runs and standardizes
    val out = Transforms.applyYeoJohnson(skewDf, Map("x" -> lamSkew))
    val r = out.agg(avg("x"), stddev("x")).head
    assert(math.abs(r.getDouble(0)) < 1e-6 && math.abs(r.getDouble(1) - 1.0) < 1e-6)
  }

  test("yeo-johnson expression matches the piecewise definition") {
    val df = Seq(3.0, -2.0, 0.0).toDF("x")
    val at1 = df.select(Transforms.yeoJohnson(col("x"), 1.0)).collect().map(_.getDouble(0))
    assert(at1 === Array(3.0, -2.0, 0.0)) // λ=1 is identity
    val at0 = df.select(Transforms.yeoJohnson(col("x"), 0.0)).head.getDouble(0)
    assert(math.abs(at0 - math.log(4.0)) < 1e-12)
  }

  test("quantile transformer maps to ~uniform and ~normal") {
    val df = spark.range(1, 5001)
      .select(exp(Split.hashUniform(col("id"), 9) * 3.0).as("x"))
    val models = Transforms.fitQuantileTransformer(df, Seq("x"))
    val uni = Transforms.applyQuantileTransformer(df, models, "uniform")
    val ru = uni.agg(min("x"), max("x"), avg("x")).head
    assert(ru.getDouble(0) >= 0 && ru.getDouble(1) <= 1)
    assert(math.abs(ru.getDouble(2) - 0.5) < 0.02)
    val norm = Transforms.applyQuantileTransformer(df, models, "normal")
    val rn = norm.agg(avg("x"), stddev("x")).head
    assert(math.abs(rn.getDouble(0)) < 0.05 && math.abs(rn.getDouble(1) - 1.0) < 0.1)
  }

  test("inverse normal cdf hits known quantiles") {
    assert(math.abs(Transforms.inverseNormalCdf(0.975) - 1.959963985) < 1e-6)
    assert(math.abs(Transforms.inverseNormalCdf(0.5)) < 1e-12)
    assert(math.abs(Transforms.inverseNormalCdf(0.0228) - (-1.9991)) < 1e-3)
  }

  /** learnable binary data (mean-separated). */
  def binary(n: Int = 1200) =
    spark.range(n).select(col("id"),
      pmod(col("id"), lit(2)).cast("double").as("y"),
      (pmod(col("id"), lit(2)) * 1.5 + Split.hashUniform(col("id"), 11)).as("f0"),
      (pmod(col("id"), lit(2)) * -1.0 + Split.hashUniform(col("id"), 12)).as("f1"),
      Split.hashUniform(col("id"), 13).as("f2"))

  test("stacking with OOF meta-features beats chance and has no leakage") {
    val df = binary().cache()
    val tagged = Split.tagHoldout(df, "id", 0.3)
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")
    val (model, oof) = Stacking.fit(train, Seq("f0", "f1", "f2"), "y", "id",
      baseModels = Seq("logistic_regression", "decision_tree"), k = 3)
    // OOF relation covers every training row exactly once
    assert(oof.count() == train.count())
    assert(oof.select("id").distinct().count() == train.count())
    val scored = Stacking.transform(model, test, "id")
    val acc = scored.filter(col("stack_prediction") === col("y")).count().toDouble /
      scored.count()
    info(s"stacking holdout acc=$acc")
    assert(acc > 0.9)
    df.unpersist()
  }

  test("bagging averages bootstrap models and classifies the holdout") {
    val df = binary(800).cache()
    val tagged = Split.tagHoldout(df, "id", 0.3)
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")
    val bags = graft.ml.Bagging.fit(train, Seq("f0", "f1", "f2"), "y", "id", nBags = 3)
    val scored = graft.ml.Bagging.transform(bags, test, "id")
    val acc = scored.filter(col("bag_prediction") === col("y")).count().toDouble /
      scored.count()
    info(s"bagging holdout acc=$acc")
    assert(acc > 0.9)
    assert(scored.agg(min("bag_probability"), max("bag_probability")).head
      .toSeq.forall { case d: Double => d >= 0.0 && d <= 1.0 })
    df.unpersist()
  }

  test("fitted MLlib pipelines persist and reload (S11)") {
    val df = binary(400)
    val pipe = Models.pipelineFor(
      Models.registry(2, 3)("logistic_regression")(), Seq("f0", "f1", "f2"), "y")
    val fitted = pipe.fit(df)
    val path = java.nio.file.Files.createTempDirectory("graft-model").toString + "/m"
    fitted.write.overwrite().save(path)
    val loaded = org.apache.spark.ml.PipelineModel.load(path)
    val a = fitted.transform(df).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(a === b)
  }
}
