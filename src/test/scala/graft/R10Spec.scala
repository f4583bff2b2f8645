package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Extras, Forest, HistGbtR, HistTree}

/** Round-10 additions: subsampled split selection (the path past the
  * 2^53 exact-fit ceiling), the hash-exact squared-error GBDT, and the
  * permutation-importance discipline. */
class R10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.toDF("id", "y", "xs").select(col("id"), col("y"),
      col("xs").cast("array<double>").as("x"))

  private def fixture(n: Int, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = rng.nextInt(3)
      (i.toLong, c, Seq(c * 50.0 + rng.nextInt(80),
        rng.nextInt(200).toDouble, c * 30.0 + rng.nextInt(100),
        rng.nextInt(50).toDouble))
    }
  }

  test("tree subsample: no-op below the cap, deterministic above it") {
    val df = frame(fixture(500))
    val full = HistTree.fit(df, "x", "y", 4, depth = 3, bins = 32)
    val noop = HistTree.fit(df, "x", "y", 4, depth = 3, bins = 32,
      keyCol = Some("id"), sampleCap = 100000)
    assert(full.splits == noop.splits && full.leaves == noop.leaves)
    val sub1 = HistTree.fit(df, "x", "y", 4, depth = 3, bins = 32,
      keyCol = Some("id"), sampleCap = 200)
    val sub2 = HistTree.fit(df.repartition(13), "x", "y", 4, depth = 3,
      bins = 32, keyCol = Some("id"), sampleCap = 200)
    assert(sub1.splits == sub2.splits && sub1.leaves == sub2.leaves)
    // split selection saw ~200 rows, but leaf majorities cover FULL
    // data: every train row routes to a leaf with a prediction
    val covered = df.select(sub1.predictExpr("x").as("p"))
      .filter(col("p").isNotNull).count()
    assert(covered == 500)
    // a subsampled fit is still a sensible fit on this separable data:
    // it must split at least the root
    assert(sub1.splits.exists(_.node == 0))
  }

  test("tree subsample refuses without a key column") {
    val df = frame(fixture(400))
    val e = intercept[IllegalArgumentException] {
      HistTree.fit(df, "x", "y", 4, depth = 2, bins = 16,
        sampleCap = 100)
    }
    assert(e.getMessage.contains("keyCol"))
  }

  test("forest subsample: deterministic, mtry respected, full-data leaves") {
    val df = frame(fixture(500))
    val m1 = Forest.fit(df, "id", "x", "y", 4, nTrees = 3, depth = 3,
      bins = 32, mtry = 2, sampleCap = 200)
    val m2 = Forest.fit(df.repartition(11), "id", "x", "y", 4, nTrees = 3,
      depth = 3, bins = 32, mtry = 2, sampleCap = 200)
    assert(m1.trees.map(_.splits) == m2.trees.map(_.splits))
    assert(m1.trees.map(_.leaves) == m2.trees.map(_.leaves))
    m1.trees.zipWithIndex.foreach { case (t, ti) =>
      t.splits.foreach(s =>
        assert(Forest.allowedFeatures(42, ti, s.node, 4, 2)(s.feature)))
    }
    // leaf majorities come from the FULL bootstrap-weighted data, so
    // in-sample coverage stays total (every row gets a vote)
    val covered = m1.predict(df, "x", "p").filter(col("p").isNotNull).count()
    assert(covered == 500)
  }

  test("gbt: integer SSE curve descends and matches the fitted predictor") {
    val df = frame(fixture(600))
    val (m, curve) = HistGbtR.fit(df, "x", "y", 4, rounds = 3, depth = 2,
      bins = 16)
    assert(curve.map(_._1) == Seq(0, 1, 2, 3))
    // squared-error boosting with exact leaf means (up to the floor-div
    // quantization) never increases training SSE
    curve.sliding(2).foreach { case Seq((_, s1, _), (_, s2, _)) =>
      assert(s2 <= s1, s"SSE rose $s1 -> $s2")
    }
    // the curve's final SSE is EXACTLY Σ(y − F_R)² of the compiled
    // predictor — the model and the curve describe the same fit
    val sse = df.select(
        (col("y").cast("long") - m.predictExpr("x")).as("r"))
      .agg(sum(col("r") * col("r"))).head().getLong(0)
    assert(sse == curve.last._2)
    // determinism under repartitioning
    val (m2, curve2) = HistGbtR.fit(df.repartition(17), "x", "y", 4,
      rounds = 3, depth = 2, bins = 16)
    assert(m2.splits == m.splits && m2.leaves == m.leaves &&
      curve2 == curve)
  }

  test("gbt classification: LS-Boost on the scaled binary target " +
    "separates a planted signal") {
    // y = 1 iff x0 > 100 — perfectly separable on the first feature;
    // fitting the ×8-scaled label and thresholding at 4 (= 1/2) must
    // recover it almost exactly (floor-div leaf quantization can leave
    // a sliver near the bin boundary)
    val rng = new scala.util.Random(11)
    val rows = (0 until 600).map { i =>
      val x0 = rng.nextInt(200).toDouble
      (i.toLong, if (x0 > 100) 1 else 0,
        Seq(x0, rng.nextInt(200).toDouble, rng.nextInt(200).toDouble,
          rng.nextInt(200).toDouble))
    }
    val df = frame(rows).withColumn("ys", (col("y") * 8).cast("long"))
    val (m, _) = HistGbtR.fit(df, "x", "ys", 4, rounds = 3, depth = 2,
      bins = 16)
    val acc = df.select(
        when((m.predictExpr("x") >= 4) === (col("y") === 1), 1L)
          .otherwise(0L).as("ok"))
      .agg(sum("ok")).head().getLong(0).toDouble / rows.size
    assert(acc > 0.95, s"planted-signal accuracy $acc")
    // prediction granularity is 1/8: every in-sample prediction stays
    // inside the scaled label range
    val mm = df.select(m.predictExpr("x").as("f"))
      .agg(min("f"), max("f")).head()
    assert(mm.getLong(0) >= -8 && mm.getLong(1) <= 16)
  }

  test("gbt subsample: no-op below the cap, deterministic above it, " +
    "full-data curve") {
    val df = frame(fixture(600))
    val (mFull, cFull) = HistGbtR.fit(df, "x", "y", 4, rounds = 3,
      depth = 2, bins = 16)
    // cap above n: keyCol present but the subsample never engages
    val (mNoop, cNoop) = HistGbtR.fit(df, "x", "y", 4, rounds = 3,
      depth = 2, bins = 16, keyCol = Some("id"), sampleCap = 100000)
    assert(mNoop.splits == mFull.splits && mNoop.leaves == mFull.leaves &&
      cNoop == cFull)
    // cap below n: subsampled split selection, partition-invariant
    val (m1, c1) = HistGbtR.fit(df, "x", "y", 4, rounds = 3, depth = 2,
      bins = 16, keyCol = Some("id"), sampleCap = 200)
    val (m2, c2) = HistGbtR.fit(df.repartition(13), "x", "y", 4,
      rounds = 3, depth = 2, bins = 16, keyCol = Some("id"),
      sampleCap = 200)
    assert(m1.splits == m2.splits && m1.leaves == m2.leaves && c1 == c2)
    // leaf values and the curve come from FULL data: the final SSE is
    // exactly Σ(y − F)² of the compiled predictor over all 600 rows,
    // and SSE still descends monotonically
    val sse = df.select(
        (col("y").cast("long") - m1.predictExpr("x")).as("r"))
      .agg(sum(col("r") * col("r"))).head().getLong(0)
    assert(sse == c1.last._2)
    c1.sliding(2).foreach { case Seq((_, s1, _), (_, s2, _)) =>
      assert(s2 <= s1, s"subsampled SSE rose $s1 -> $s2")
    }
    // the subsample genuinely engaged: split-selection residual sums
    // cover ≈200 rows, not 600
    assert(m1.splits.filter(_.round == 1).map(s => s.nLeft + s.nRight).max
      < 400)
    assert(mFull.splits.filter(_.round == 1).map(s => s.nLeft + s.nRight)
      .max == 600)
  }

  test("gbt subsample still refuses when the SUBSAMPLE breaks the bound") {
    // cap=50 but residuals ~2^19: (50·2^19)²·50 ≈ 2^55 — the realized-
    // subsample guard must refuse rather than drift
    val big = (0 until 100).map(i =>
      (i.toLong, (i % 2) * (1 << 20), Seq(i.toDouble, 0.0, 0.0, 0.0)))
    val df = big.toDF("id", "y", "xs").select(col("id"), col("y"),
      col("xs").cast("array<double>").as("x"))
    val e = intercept[IllegalArgumentException] {
      HistGbtR.fit(df, "x", "y", 4, rounds = 1, depth = 2, bins = 16,
        keyCol = Some("id"), sampleCap = 50)
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("gbt refuses when score operands could leave the exact range") {
    // y alternates 0 / 2^20 so RESIDUALS (not just the label) are ~2^19
    // — a constant y would give r=0 everywhere and nothing to refuse
    val big = (0 until 100).map(i =>
      (i.toLong, (i % 2) * (1 << 20), Seq(i.toDouble, 0.0, 0.0, 0.0)))
    val df = big.toDF("id", "y", "xs").select(col("id"), col("y"),
      col("xs").cast("array<double>").as("x"))
    // n=100, max|r| ≈ 2^19: (n·maxr)²·n ≈ 2^57.9 — must refuse loudly
    val e = intercept[IllegalArgumentException] {
      HistGbtR.fit(df, "x", "y", 4, rounds = 1, depth = 2, bins = 16)
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("elastic net: lasso recovers the planted coefficient and zeroes " +
    "noise dims exactly") {
    // y = x0/50 (+ small integer noise); x1..x3 pure noise
    val rng = new scala.util.Random(3)
    val rows = (0 until 800).map { i =>
      val x0 = rng.nextInt(5000).toDouble
      (i.toLong, (x0 / 50.0).toInt + rng.nextInt(2),
        Seq(x0, rng.nextInt(5000).toDouble, rng.nextInt(5000).toDouble,
          rng.nextInt(5000).toDouble))
    }
    val df = frame(rows)
    val Seq(ols, mid, big) = graft.ml.ElasticNet.path(df, "x", "y", 4,
      lambdas = Seq(0.0, 2.0e4, 2.0e5), alpha = 0.5, sweeps = 25)
    assert(math.abs(ols.betas(0) - 0.02) < 0.001, ols.betas.toSeq.toString)
    assert((1 to 3).forall(j => math.abs(ols.betas(j)) < 0.002))
    // moderate λ keeps the signal, kills the noise dims EXACTLY (the
    // soft threshold's zero arm, not numerics)
    assert(mid.betas(0) > 0.012)
    assert((1 to 3).forall(j => mid.betas(j) == 0.0), mid.betas.toSeq.toString)
    // huge λ zeroes everything; intercept falls back to the mean
    assert(big.betas.forall(_ == 0.0))
    // λ = 0 with enough sweeps solves the normal equations: an
    // independent pure-Scala Gaussian elimination on the same moments
    val m = graft.ml.ElasticNet.moments(df, "x", "y", 4)
    val a = Array.tabulate(4, 5)((j, k) =>
      if (k < 4) m.sxx(j)(k) - m.sx(j) * m.sx(k) / m.n
      else m.sxy(j) - m.sx(j) * m.sy / m.n)
    for (p <- 0 until 4) {
      val pv = a(p)(p)
      for (c <- p to 4) a(p)(c) /= pv
      for (r <- 0 until 4 if r != p) {
        val f = a(r)(p)
        for (c <- p to 4) a(r)(c) -= f * a(p)(c)
      }
    }
    for (j <- 0 until 4)
      assert(math.abs(ols.betas(j) - a(j)(4)) < 1e-9,
        s"CD vs normal equations at $j: ${ols.betas(j)} vs ${a(j)(4)}")
    // partition invariance is bit-exact (decimal moments)
    val again = graft.ml.ElasticNet.path(df.repartition(13, col("id")),
      "x", "y", 4, lambdas = Seq(0.0, 2.0e4, 2.0e5), alpha = 0.5,
      sweeps = 25)
    assert(again.map(_.betas.toSeq) == Seq(ols, mid, big).map(_.betas.toSeq))
  }

  test("isolation forest: planted outliers isolate in the shortest paths") {
    // tight cluster around (100, 100, 100, 100) plus two far outliers —
    // the outliers must take the two smallest average path lengths
    val rng = new scala.util.Random(5)
    val rows = (0 until 400).map(i =>
      (i.toLong, 0, Seq.fill(4)(100.0 + rng.nextInt(11) - 5))) ++
      Seq((900L, 0, Seq(1000.0, 1000.0, 1000.0, 1000.0)),
        (901L, 0, Seq(-800.0, -800.0, -800.0, -800.0)))
    val df = frame(rows)
    val m = graft.ml.IsoForest.fit(df, "id", "x", 4,
      trees = 8, depth = 6, seed = 42, sampleFrac = 0.7)
    val scored = graft.ml.IsoForest.score(m, df, "id", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byPath = scored.sortBy(_._2).map(_._1).take(2).toSet
    assert(byPath == Set(900L, 901L), s"top-2 anomalous: $byPath")
    // determinism: same model and scores under repartitioning
    val m2 = graft.ml.IsoForest.fit(df.repartition(9, col("id")), "id", "x",
      4, trees = 8, depth = 6, seed = 42, sampleFrac = 0.7)
    assert(m2.splits == m.splits &&
      m2.leafSizes.sorted == m.leafSizes.sorted)
    val scored2 = graft.ml.IsoForest.score(m2, df, "id", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(scored2.toSeq == scored.sorted.toSeq)
  }

  test("permutation importance: planted-signal dims dominate") {
    // dims 0 and 2 carry the class; permuting them must cost accuracy,
    // permuting pure-noise dims must cost (almost) nothing — the M14
    // criterion under the md5-rotation permutation the query uses
    val df = frame(fixture(600)).localCheckpoint(true)
    val m = Forest.fit(df, "id", "x", "y", 4, nTrees = 4, depth = 3,
      bins = 32, mtry = 2)
    def acc(scored: org.apache.spark.sql.DataFrame): Double = {
      val r = m.predict(scored, "x", "p").filter(col("p").isNotNull)
        .agg(sum(when(col("y") === col("p"), 1L).otherwise(0L)).as("c"),
          count(lit(1)).as("t")).head()
      r.getAs[Long]("c").toDouble / r.getAs[Long]("t")
    }
    val n = df.count()
    def permuted(i: Int) = {
      val ranked = Extras.hashRank(df, "id", 1000, "__rn")
      val shifted = ranked.select(
        (pmod(col("__rn"), lit(n)) + 1).as("__rn"),
        element_at(col("x"), i + 1).as("__xi"))
      ranked.join(shifted, Seq("__rn"))
        .withColumn("x", array((0 until 4).map(j =>
          if (j == i) col("__xi") else element_at(col("x"), j + 1)): _*))
        .drop("__rn", "__xi")
    }
    val base = acc(df)
    val drops = (0 until 4).map(i => base - acc(permuted(i)))
    assert(drops(0) > 0.1, s"signal dim 0 drop ${drops(0)}")
    assert(drops(0) > drops(1) && drops(0) > drops(3),
      s"signal must dominate noise: $drops")
  }
}
