package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Models, Qda, Split}

/** Model layer tests. The embeddings table's labels are statistically
  * independent of the vectors (max |corr(dim, label)| ≈ 0.08, all vectors
  * unit-norm), so it only exercises MECHANICS — training, CV, scoring all
  * run end-to-end at ~0.1 chance accuracy. Model QUALITY is asserted on a
  * constructed, genuinely learnable dataset (mean-separated Gaussians). */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.01"

  /** embeddings with the first `d` dims as plain columns f0..f(d-1). */
  def featured(d: Int) = {
    val e = graft.core.Tables(spark, sfDir, "embeddings")
    val cols = (0 until d).map(i =>
      element_at(col("embedding"), i + 1).cast("double").as(s"f$i"))
    e.select(col("vec_id") +: col("label").cast("double").as("y") +: cols: _*)
  }

  def majorityShare(df: org.apache.spark.sql.DataFrame): Double = {
    val counts = df.groupBy("y").count().collect().map(_.getLong(1))
    counts.max.toDouble / counts.sum
  }

  /** 3 mean-separated Gaussian-ish classes, 4 features, deterministic. */
  def learnable(n: Int = 900) = {
    val u = (c: Int) => Split.hashUniform(concat_ws("#", col("id"), lit(c)), 7)
    spark.range(n).select(col("id"),
        pmod(col("id"), lit(3)).cast("double").as("y"),
        (pmod(col("id"), lit(3)) * 2.0 + u(0)).as("f0"),
        (pmod(col("id"), lit(3)) * -1.5 + u(1)).as("f1"),
        u(2).as("f2"), u(3).as("f3"))
  }

  test("MLlib pipelines train end-to-end on embeddings (mechanics only)") {
    val df = featured(64).cache()
    val tagged = Split.tagHoldout(df, "vec_id", 0.25)
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")
    val feats = (0 until 64).map(i => s"f$i")
    for (name <- Seq("logistic_regression", "random_forest")) {
      val pipe = Models.pipelineFor(Models.registry(10)(name)(), feats, "y")
      val acc = Models.evaluate(pipe.fit(train).transform(test), "y")
      info(s"$name acc=$acc (labels are noise → ≈0.1 expected)")
      assert(acc > 0.04 && acc <= 1.0)
    }
    df.unpersist()
  }

  test("models reach high accuracy on a learnable dataset") {
    val df = learnable().cache()
    val tagged = Split.tagHoldout(df, "id", 0.3)
    val train = tagged.filter(col("split") === "train")
    val test = tagged.filter(col("split") === "test")
    val feats = Seq("f0", "f1", "f2", "f3")
    for (name <- Seq("logistic_regression", "random_forest")) {
      val pipe = Models.pipelineFor(Models.registry(3, 4)(name)(), feats, "y")
      val acc = Models.evaluate(pipe.fit(train).transform(test), "y")
      info(s"$name learnable acc=$acc")
      assert(acc > 0.9, s"$name should separate mean-coded classes, got $acc")
    }
    val stats = Qda.fit(train, feats, "y", regParam = 1e-3)
    val acc = test.withColumn("p", Qda.predictExpr(stats, feats))
      .filter(col("p") === col("y")).count().toDouble / test.count()
    info(s"QDA learnable holdout acc=$acc")
    assert(acc > 0.9)
    df.unpersist()
  }

  test("stratified CV harness returns k folds per model and sane summary") {
    val df = featured(8)
    val results = Models.crossValidate(df, (0 until 8).map(i => s"f$i"), "y",
      "vec_id", k = 3, numClasses = 10,
      models = Some(Seq("decision_tree", "naive_bayes")))
    assert(results.size == 6)
    val summary = Models.summarizeCv(spark, results).collect()
    assert(summary.length == 2)
    // 10 balanced classes → anything clearly above random-guess floor
    assert(summary.forall(r => r.getDouble(1) > 0.05 && r.getDouble(1) <= 1.0))
  }

  test("GaussianNb matches hand-computed sklearn parameters and posteriors") {
    import graft.ml.GaussianNb
    // two classes, two features; moments small enough to verify by hand
    val df = Seq(
      (0.0, 1.0, 2.0), (0.0, 2.0, 4.0), (0.0, 3.0, 6.0),
      (1.0, 10.0, 1.0), (1.0, 12.0, 3.0)
    ).toDF("y", "a", "b").withColumn("x", array(col("a"), col("b")))
    val stats = GaussianNb.fitArray(df, "x", "y", d = 2)
    assert(stats.map(_.label) == Seq(0.0, 1.0))
    val s0 = stats(0); val s1 = stats(1)
    assert(math.abs(s0.prior - 0.6) < 1e-12 && math.abs(s1.prior - 0.4) < 1e-12)
    assert(s0.mean.toSeq == Seq(2.0, 4.0) && s1.mean.toSeq == Seq(11.0, 2.0))
    // BIASED variances (np.var): class0 a: ((1+4+9)/3 - 4) = 2/3
    val globalMaxVar = {
      // feature a over all 5: mean 5.6, E[x²] = (1+4+9+100+144)/5 = 51.6
      val va = 51.6 - 5.6 * 5.6
      val vb = (4.0 + 16 + 36 + 1 + 9) / 5 - math.pow(16.0 / 5, 2)
      math.max(va, vb)
    }
    val eps = 1e-9 * globalMaxVar
    assert(math.abs(s0.variance(0) - (2.0 / 3 + eps)) < 1e-12)
    assert(math.abs(s1.variance(0) - (1.0 + eps)) < 1e-12)
    // posterior argmax: a point near class 1's mean classifies as 1,
    // near class 0's as 0; ties impossible here
    val probe = Seq((10.5, 2.0), (2.5, 4.0)).toDF("a", "b")
      .withColumn("x", array(col("a"), col("b")))
    val preds = probe.select(GaussianNb.predictExpr(stats, "x")).as[Double].collect()
    assert(preds.toSeq == Seq(1.0, 0.0))
  }

  test("GNB oracle safety: argmax margins dwarf cross-engine ulp noise") {
    import graft.ml.GaussianNb
    // q_l_gnb_confusion's hash-exactness rests on the top-2 score margin
    // being many orders above the ~1e-15 drift ln() is allowed between
    // JVM Math.log and libm — measure it on the exact fit the query runs
    val e = graft.core.Tables(spark, sfDir, "embeddings")
    // same quantized feature frame as q_l_gnb_* (floor(x·1e6 + 0.5))
    val base = e.select(col("label").cast("double").as("y"),
      array((0 until 4).map(i =>
        floor(element_at(col("embedding"), i + 1).cast("double") * lit(1e6)
          + lit(0.5)).cast("double")): _*).as("x"))
    val stats = GaussianNb.fitArrayExact(base, "x", "y", 4)
    val arr = array_sort(array(stats.map(cs => GaussianNb.scoreExpr(cs, "x")): _*))
    val minMargin = base
      .select((element_at(arr, -1) - element_at(arr, -2)).as("margin"))
      .agg(min("margin")).head.getDouble(0)
    info(f"min top-2 GNB score margin over ${base.count()} rows: $minMargin%.3e")
    assert(minMargin > 1e-9,
      f"argmax margin $minMargin%.3e too small to absorb ln() ulp differences")
  }

  test("GNB fitCvExact is bit-identical to per-fold fitArrayExact") {
    import graft.ml.{GaussianNb, Split}
    // the fold-melted CV fit (one groupBy(fold,label) pass, driver-side
    // BIGINT recombination) must reproduce every parameter of the direct
    // per-fold fits EXACTLY — same associativity argument the oracle
    // replay rests on, so any drift here would break q_l_gnb_cv /
    // q_l_tournament hash-exactness
    val k = 5
    val e = graft.core.Tables(spark, sfDir, "embeddings")
    val tagged = Split.tagStratifiedKFold(
      e.select(col("vec_id"), col("label").cast("double").as("y"),
        array((0 until 4).map(i =>
          floor(element_at(col("embedding"), i + 1).cast("double") * lit(1e6)
            + lit(0.5)).cast("double")): _*).as("x")),
      "vec_id", "y", k).localCheckpoint(true)
    val melted = GaussianNb.fitCvExact(tagged, "x", "y", "fold", k, 4)
    (0 until k).foreach { f =>
      val direct = GaussianNb.fitArrayExact(
        tagged.filter(col("fold") =!= f), "x", "y", 4)
      assert(melted(f).size == direct.size, s"fold $f class count")
      melted(f).zip(direct).foreach { case (m, dd) =>
        assert(m.label == dd.label && m.prior == dd.prior, s"fold $f prior")
        assert(m.mean.toSeq == dd.mean.toSeq, s"fold $f mean")
        assert(m.variance.toSeq == dd.variance.toSeq, s"fold $f variance")
      }
    }
  }

  test("KNN classifier: near-perfect on separable blobs, deterministic vote ties") {
    import graft.ml.Knn
    // 10 well-separated Gaussian blobs, one per label: 11-NN must recover
    // the generating label for held-in queries (genuine quality, unlike
    // the label-independent embeddings table)
    val rng = new scala.util.Random(5)
    val dims = 16
    val centers = Array.fill(10)(Array.fill(dims)(rng.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 10)
      (i.toLong, (i % 10).toLong, c.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq)
    }
    val e = rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<float>").as("embedding"))
      .cache()
    val pred = Knn.predictWithTruth(e, e.filter(col("vec_id") < 50), k = 11)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val acc = pred.count { case (t, p) => t == p }.toDouble / pred.length
    info(f"11-NN blob accuracy: $acc%.2f")
    assert(acc >= 0.95, f"KNN should recover separable blobs: $acc%.2f")
    e.unpersist()
    // tie determinism: two labels with equal votes -> the SMALLER label
    // wins (k=2 over one neighbor of each label at equal distance shape)
    val tiny = Seq(
      (0L, 5L, Seq(1f, 0f)),  // query (label irrelevant to the vote)
      (1L, 7L, Seq(0.8f, 0.6f)),
      (2L, 3L, Seq(0.8f, -0.6f))
    ).toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<float>").as("embedding"))
    val t = Knn.predict(tiny, tiny.filter(col("vec_id") === 0), k = 2)
      .head.getLong(1)
    assert(t == 3L, s"equal votes must tie to the smallest label, got $t")
  }

  test("QDA expression scorer separates classes (d=12)") {
    val df = featured(12).cache()
    val feats = (0 until 12).map(i => s"f$i")
    val base = majorityShare(df)
    val stats = Qda.fit(df, feats, "y", regParam = 1e-3)
    assert(stats.size == 10 && math.abs(stats.map(_.prior).sum - 1.0) < 1e-9)
    val pred = df.withColumn("pred", Qda.predictExpr(stats, feats))
    val acc = pred.filter(col("pred") === col("y")).count().toDouble / pred.count()
    info(s"QDA(d=12) acc=$acc (baseline $base)")
    assert(acc > base)
    df.unpersist()
  }

  test("QDA udf scorer agrees with expression scorer and scales to d=32") {
    val df = featured(8)
    val feats = (0 until 8).map(i => s"f$i")
    val stats = Qda.fit(df, feats, "y", regParam = 1e-3)
    val both = df
      .withColumn("p_expr", Qda.predictExpr(stats, feats))
      .withColumn("p_udf", Qda.predictUdf(stats)(array(feats.map(col): _*)))
    assert(both.filter(col("p_expr") =!= col("p_udf")).count() == 0)

    val wide = featured(32)
    val wfeats = (0 until 32).map(i => s"f$i")
    val wstats = Qda.fit(wide, wfeats, "y", regParam = 1e-3)
    val acc = wide.withColumn("p", Qda.predictUdf(wstats)(array(wfeats.map(col): _*)))
      .filter(col("p") === col("y")).count().toDouble / wide.count()
    info(s"QDA(d=32) acc=$acc")
    assert(acc > majorityShare(wide))
  }

  test("LDA (pooled covariance) also works") {
    val df = featured(8)
    val feats = (0 until 8).map(i => s"f$i")
    val stats = Qda.fit(df, feats, "y", regParam = 1e-3, pooled = true)
    val acc = df.withColumn("p", Qda.predictExpr(stats, feats))
      .filter(col("p") === col("y")).count().toDouble / df.count()
    info(s"LDA acc=$acc")
    assert(acc > majorityShare(df))
  }

  test("random search over LR regParam returns trials with varying scores") {
    val df = featured(8)
    val trials = Models.randomSearchLr(df, (0 until 8).map(i => s"f$i"), "y",
      "vec_id", nTrials = 3)
    assert(trials.size == 3)
    assert(trials.forall { case (rp, acc) => rp > 0 && acc > 0 && acc <= 1.0 })
  }
}
