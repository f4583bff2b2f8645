package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.HistTree

class TreeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Int, Seq[Double])]) =
    rows.toDF("y", "xs").select(col("y"), col("xs").cast("array<double>").as("x"))

  test("separable classes yield a perfect depth-1 split") {
    // class 0 at x0 in [0,100], class 1 at x0 in [1000,1100]; x1 is noise
    val rows = (0 until 50).map(i => (0, Seq(i * 2.0, (i % 7).toDouble))) ++
      (0 until 50).map(i => (1, Seq(1000.0 + i * 2.0, (i % 5).toDouble)))
    val m = HistTree.fit(frame(rows), "x", "y", d = 2, depth = 1, bins = 32)
    assert(m.splits.size == 1)
    assert(m.splits.head.feature == 0)
    assert(m.splits.head.nLeft == 50 && m.splits.head.nRight == 50)
    val acc = frame(rows)
      .select((col("y") === m.predictExpr("x").cast("int")).cast("int").as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(acc == 1.0)
  }

  test("pure nodes stop splitting (strict integer improvement test)") {
    val rows = (0 until 40).map(i => (3, Seq(i.toDouble, (i * 13 % 29).toDouble)))
    val m = HistTree.fit(frame(rows), "x", "y", d = 2, depth = 3, bins = 16)
    assert(m.splits.isEmpty)
    assert(m.leaves == Map(0 -> 3))
  }

  test("fit is invariant under repartitioning (integer argmin, no order dependence)") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map { _ =>
      val c = rng.nextInt(3)
      (c, Seq(c * 50.0 + rng.nextInt(80), rng.nextInt(200).toDouble,
        c * 30.0 + rng.nextInt(100)))
    }
    val df = frame(rows)
    val m1 = HistTree.fit(df, "x", "y", d = 3, depth = 3, bins = 32)
    val m2 = HistTree.fit(df.repartition(13), "x", "y", d = 3, depth = 3, bins = 32)
    assert(m1.splits == m2.splits)
    assert(m1.leaves == m2.leaves)
    // and the tree must beat the majority baseline on its training data
    val pred = df.select(col("y"),
      m1.predictExpr("x").cast("int").as("p"))
    val acc = pred.select(avg((col("y") === col("p")).cast("int"))).head().getDouble(0)
    val baseline = rows.groupBy(_._1).map(_._2.size).max.toDouble / rows.size
    assert(acc > baseline + 0.2, s"acc=$acc baseline=$baseline")
  }

  test("ties in the leaf vote go to the smallest label") {
    // one leaf, two classes with equal counts, no separating feature
    val rows = (0 until 20).map(i => (if (i % 2 == 0) 7 else 2, Seq(1.0)))
    val m = HistTree.fit(frame(rows), "x", "y", d = 1, depth = 2, bins = 8)
    assert(m.leaves.values.toSet == Set(2))
  }
}
