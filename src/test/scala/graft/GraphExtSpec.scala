package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Graph
import graft.ml.Prep

class GraphExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents labels chains, cliques and isolated pairs") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val comps = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents merges components that meet late (long chain)") {
    // two chains joined at the far end: 1-2-...-6 and 100-6
    val edges = ((1L to 5L).map(i => (i, i + 1)) :+ (100L, 6L)).toDF("a", "b")
    val comps = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet == Set(1L))
    assert(comps.size == 7)
  }

  test("connectedComponents runs O(log d) star rounds on a path graph") {
    // 48-node path: diameter 47 — min-label propagation needs ~47 rounds
    // (and would be CUT OFF by maxIter=25); the large-star/small-star
    // alternation contracts path length geometrically
    val edges = (0L until 47L).map(i => (i, i + 1)).toDF("a", "b")
    val (comps, rounds) =
      Graph.connectedComponentsWithRounds(edges, "a", "b")
    val m = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 48 && m.values.toSet == Set(0L))
    assert(rounds <= 10, s"path-48 took $rounds star rounds")
  }

  test("connectedComponents keeps self-loop-only vertices in the output") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("a", "b")
    val m = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("label propagation separates two cliques joined by one bridge") {
    // cliques {1..4} and {10..13}, bridged 4-10: LPA must give each
    // clique one label and must NOT merge them (CC would)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L))).toDF("a", "b")
    val labels = Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Seq(1L, 2L, 3L, 4L).map(labels)
    val c2 = Seq(10L, 11L, 12L, 13L).map(labels)
    assert(c1.distinct.size == 1, s"clique 1 split: $labels")
    assert(c2.distinct.size == 1, s"clique 2 split: $labels")
    assert(c1.head != c2.head, s"cliques merged: $labels")
    // determinism under repartitioning (synchronous rounds + total
    // tie-break — the property the oracle replay depends on)
    val again = Graph
      .labelPropagation(edges.repartition(7, col("b")), "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == labels)
  }

  test("componentSizes summarizes duplicate groups") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val sizes = Graph.componentSizes(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 10L -> 2L))
  }

  test("pageRank: mass conserved, hubs rank highest, partitioning-invariant") {
    // star around 1 (degree 4) plus a 2-cycle tail: 1 must outrank all
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L))
      .toDF("a", "b")
    val pr = Graph.pageRank(edges, "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 6)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // no dangling mass lost
    assert(pr(1L) == pr.values.max)              // hub dominates
    assert(pr(6L) < pr(5L))                      // leaf below its gateway
    // decimal-quantized contributions ⇒ bit-identical under any layout
    val pr2 = Graph.pageRank(edges.repartition(7), "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr == pr2)
  }

  test("corrMatrixLong matches corrMatrix on fixed-point data") {
    val df = Seq((100L, 205L), (210L, 400L), (315L, 640L), (420L, 805L), (155L, 310L))
      .toDF("xl", "yl")
      .withColumn("x", col("xl") / 100.0).withColumn("y", col("yl") / 100.0)
    val slow = Prep.corrMatrix(df, Seq("x", "y")).collect()(0).getDouble(2)
    val fast = Prep.corrMatrixLong(df, Seq("x" -> col("xl"), "y" -> col("yl")))
      .collect()(0).getDouble(2)
    assert(math.abs(slow - fast) < 1e-12, s"slow=$slow fast=$fast")
    // scale invariance: r is identical whether computed on x or 100x
    val unscaled = Prep.corrMatrixLong(df,
      Seq("x" -> col("xl"), "y" -> col("yl"))).collect()(0).getDouble(2)
    assert(math.abs(unscaled - fast) == 0.0)
  }

  test("ntileExact reproduces the SQL NTILE window bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Ranking
    // n=1037, k=7: uneven buckets exercise the front-loaded remainder
    val df = (1 to 1037).map(i => (i.toLong, (i * 37 % 500).toDouble)).toDF("id", "v")
    val expected = df
      .withColumn("b", ntile(7).over(Window.orderBy(col("v"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = Ranking.ntileExact(df, Seq(col("v"), col("id")), 7, "b")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("ntileExact matches SQL NTILE under a DESCENDING order key (lift-decile path)") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Ranking
    val df = (1 to 503).map(i => (i.toLong, (i * 89 % 97).toDouble)).toDF("id", "v")
    val expected = df
      .withColumn("b", ntile(10).over(Window.orderBy(col("v").desc, col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = Ranking.ntileExact(df, Seq(col("v").desc, col("id").asc), 10, "b")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("distributed byValue midranks match a single-window oracle exactly") {
    import graft.stats.Ranks
    import org.apache.spark.sql.expressions.Window
    // 5000 distinct values spread over every range bucket, plus ties
    val df = ((1 to 5000).map(_.toLong) ++ Seq(17L, 17L, 42L)).toDF("v")
    // oracle: the classic one-window midrank over the distinct-value
    // relation (test-only — the engine path must never single-partition)
    val counts = df.groupBy("v").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val simple = counts.withColumn("avg_rank",
        coalesce(sum("cnt").over(w), lit(0L)).cast("double") +
          (col("cnt") + lit(1)) / 2.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val dist = Ranks.byValue(df, "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(dist == simple)
    // midrank sum over all rows (cnt * avg_rank) must equal n(n+1)/2
    val n = 5003L
    val total = simple.values.map { case (c, r) => c * r }.sum
    assert(total == n * (n + 1) / 2.0, s"total=$total")
    // tie group of three 17s: midrank = 17+1 = 18 (ranks 17,18,19)
    assert(simple(17L) == ((3L, 18.0)))
  }

  test("runningSum equals the single-partition window sum") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Prefix
    val df = (1 to 3000).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "v")
    val expected = df.withColumn("cum",
        sum("v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Prefix.runningSum(df, Seq(col("id")), col("v"), "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("chunkText produces overlapping windows that reassemble the text") {
    import graft.text.TextOps
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz"), (2L, "xy")).toDF("id", "t")
    val chunks = TextOps.chunkText(df, "id", "t", size = 10, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // starts at 0, 6, 12, 18, 24 — every char covered, 4-char overlaps
    assert(doc1.toSeq == Seq("abcdefghij", "ghijklmnop", "mnopqrstuv",
      "stuvwxyz", "yz"))
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("xy"))
  }

  test("yeo-johnson grid-explode fit picks the same lambda as a direct scan") {
    import graft.ml.Transforms
    val rng = new scala.util.Random(7)
    val df = (1 to 2000).map(_ => math.exp(rng.nextGaussian())).toDF("v")
    val lam = Transforms.fitYeoJohnson(df, Seq("v"))("v")
    // right-skewed positive data wants a contracting transform: λ < 1
    // (YJ's x+1 shift moves the optimum below Box-Cox's λ≈0)
    assert(lam > -2.0 && lam < 1.0, s"lambda=$lam")
    // against the reference wide-aggregate formulation on a small grid
    val grid = Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
    val direct = grid.maxBy { l =>
      val psi = Transforms.yeoJohnson(col("v"), l)
      val r = df.agg(sum(psi).as("s"), sum(psi * psi).as("ss"),
        count(lit(1)).cast("double").as("n"),
        sum(signum(col("v")) * log(abs(col("v")) + 1)).as("slog")).head()
      val (s, ss, n, slog) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val v = ss / n - (s / n) * (s / n)
      if (v <= 0 || v.isNaN) Double.NegativeInfinity
      else -n / 2.0 * math.log(v) + (l - 1) * slog
    }
    val gridFit = Transforms.fitYeoJohnson(df, Seq("v"), grid)("v")
    assert(gridFit == direct, s"explode=$gridFit direct=$direct")
  }
}
