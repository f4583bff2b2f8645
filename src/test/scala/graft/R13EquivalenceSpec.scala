package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Direct equivalence specs for the round-13 bit-exactness-critical
  * rewrites (until r13 these were covered only end-to-end by the oracle):
  *  - TreeLeafDescend native descent ≡ the per-level path-CASE cascade it
  *    replaced, on random data including nulls / NaN / out-of-range;
  *  - HistTree.deriveLeafCounts ≡ the dedicated groupBy leaf pass;
  *  - KMeans.fitGridBatch ≡ per-subspace fitGrid on each slice.
  */
class R13EquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r13 path-CASE leaf cascade, reconstructed literally: one
    * level at a time, rows at a split node route by bin(feature) <= bin
    * with the null/NaN comparison falling to the right child. */
  private def cascadeLeaf(arrCol: String, m: HistTree.TreeModel)
      : org.apache.spark.sql.Column = {
    val b = HistTree.binExprs(arrCol, m.mins, m.maxs, m.bins)
    def level(n: Int): Int = 31 - Integer.numberOfLeadingZeros(n + 1)
    var node: org.apache.spark.sql.Column = lit(0)
    m.splits.groupBy(s => level(s.node)).toSeq.sortBy(_._1)
      .foreach { case (_, ss) =>
        var next = node
        ss.foreach { s =>
          next = when(node === s.node,
            when(b(s.feature) <= s.bin, lit(2 * s.node + 1))
              .otherwise(lit(2 * s.node + 2))).otherwise(next)
        }
        node = next
      }
    node
  }

  test("TreeLeafDescend ≡ path-CASE cascade (random data, nulls, NaN, " +
    "out-of-range)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 600).map { i =>
      val c = rng.nextInt(3)
      (i.toLong, c,
        Seq(c * 40.0 + rng.nextInt(60), rng.nextInt(150).toDouble,
          c * 25.0 + rng.nextInt(90)))
    }
    val df = rows.toDF("id", "y", "xs")
      .select(col("id"), col("y"), col("xs").cast("array<double>").as("x"))
    val m = HistTree.fit(df, "x", "y", d = 3, depth = 3, bins = 16)
    assert(m.splits.nonEmpty, "fixture must actually split")
    // scoring data: in-range, out-of-range (clamps into edge bins),
    // null elements and NaN (both must route identically in both forms)
    val score = (0 until 400).map { i =>
      val raw: Seq[java.lang.Double] = i % 10 match {
        case 7 => Seq(Double.NaN, rng.nextInt(150).toDouble, 5.0)
        case 8 => Seq(null, 3.0, 1e9)
        case 9 => Seq(-1e9, Double.NaN, null)
        case _ => Seq(rng.nextInt(200) - 30.0, rng.nextInt(200).toDouble,
          rng.nextInt(200) - 50.0)
      }
      (i.toLong, raw)
    }.toDF("id", "x")
    val cmp = score.select(col("id"),
        m.leafExpr("x").as("native"), cascadeLeaf("x", m).as("cascade"))
      .filter(not(col("native") <=> col("cascade")))
    assert(cmp.isEmpty, s"diverging rows: ${cmp.take(5).mkString(", ")}")
  }

  test("deriveLeafCounts ≡ direct groupBy over the training rows") {
    val rng = new scala.util.Random(13)
    // synthetic binned training rows at the LAST level: (key, node, bins, y)
    val rows = (0 until 2000).map { _ =>
      (rng.nextInt(2), rng.nextInt(3) + 3, // keys 0/1, nodes 3..5
        IndexedSeq.fill(4)(rng.nextInt(8)), rng.nextInt(3))
    }
    // the last level's histogram: per (key, node, feature, bin, y) counts
    val counts: Array[(Int, Int, Int, Int, Int, Long)] =
      rows.flatMap { case (k, n, bs, y) =>
        bs.indices.map(f => (k, n, f, bs(f), y))
      }.groupBy(identity).map { case ((k, n, f, b, y), g) =>
        (k, n, f, b, y, g.size.toLong)
      }.toArray
    // split some nodes; leave node 5 terminal
    val best = Map((0, 3) -> (1, 3), (0, 4) -> (0, 5), (1, 3) -> (2, 2),
      (1, 4) -> (3, 4))
    val derived = HistTree.deriveLeafCounts[Int](counts, best)
      .toSet
    // reference: count the rows directly (the pre-r13 dedicated pass)
    val direct = rows.flatMap { case (k, n, bs, y) =>
      best.get((k, n)) match {
        case Some((sf, sb)) =>
          Seq((k, if (bs(sf) <= sb) 2 * n + 1 else 2 * n + 2, y))
        case None => Seq((k, n, y))
      }
    }.groupBy(identity).map { case ((k, n, y), g) =>
      (k, n, y, g.size.toLong)
    }.toSet
    assert(derived == direct)
  }

  test("fitGridBatch ≡ fitGrid per subspace slice (and assignGridBatch " +
    "≡ assignGridUnder per slice)") {
    val rng = new scala.util.Random(99)
    val subspaces = 4; val subDims = 3; val k = 5
    val grid = (0 until 300).map { i =>
      (i.toLong, Seq.fill(subspaces * subDims)(rng.nextInt(2000001) - 1000000L))
    }.toDF("vec_id", "qa")
    val batch = KMeans.fitGridBatch(grid, "vec_id", "qa", k, iters = 3,
      subspaces, subDims)
    (0 until subspaces).foreach { s =>
      val sliced = grid.select(col("vec_id"),
        slice(col("qa"), s * subDims + 1, subDims).as("qs"))
      val single = KMeans.fitGrid(sliced, "vec_id", "qs", k, iters = 3)
      assert(batch(s) == single, s"subspace $s fixpoint diverges")
      val aB = KMeans.assignGridBatch(grid, "vec_id", "qa", batch, subDims)
        .filter(col("subspace") === s)
        .select(col("vec_id"), col("cluster")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val aS = KMeans.assignGridUnder(sliced, "vec_id", "qs", single)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(aB == aS, s"subspace $s assignment diverges")
    }
  }
}
