package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Num, Ranking}
import graft.text.TextOps

/** Property-style tests: ScalaCheck generators (fixed seeds — the suite
  * must be deterministic) produce randomized datasets, and each engine
  * operator is checked against an independent Scala reference
  * implementation over every generated row. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sampled[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("dsum equals the exact BigDecimal reference on random doubles") {
    val xs = sampled(Gen.listOfN(2000,
      Gen.chooseNum(-1e6, 1e6)), seed = 1L)
    val expected = xs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val got = xs.toDF("v").repartition(13).agg(Num.dsum(col("v"))).head.getDouble(0)
    assert(got == expected)
  }

  test("cut matches pandas (lo, hi] reference binning on random values") {
    val bins = Seq(-1e9, -10.0, 0.0, 42.5, 1e9)
    val labels = Seq("a", "b", "c", "d")
    def ref(x: Double): String =
      labels.indices.reverse.collectFirst {
        case i if x > bins(i) && x <= bins(i + 1) => labels(i)
      }.orNull
    val xs = sampled(Gen.listOfN(1000, Gen.oneOf(
      Gen.chooseNum(-100.0, 100.0), Gen.oneOf(-10.0, 0.0, 42.5))), seed = 2L)
    val rows = xs.toDF("x")
      .select(col("x"), Cleaning.cut(col("x"), bins, labels).as("bin"))
      .collect()
    rows.foreach(r => assert(r.getString(1) == ref(r.getDouble(0)),
      s"x=${r.getDouble(0)}"))
  }

  test("hammingDistance equals Long.bitCount of xor on random fingerprints") {
    val ps = sampled(Gen.listOfN(500,
      Gen.zip(Gen.long, Gen.long)), seed = 3L)
    val rows = ps.toDF("a", "b")
      .select(col("a"), col("b"),
        TextOps.hammingDistance(col("a"), col("b")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(2) == java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(1)))
    }
  }

  test("topNPerGroup matches a sort-based reference per group") {
    val rows = sampled(Gen.listOfN(800,
      Gen.zip(Gen.choose(0, 9), Gen.chooseNum(-1e3, 1e3))), seed = 4L)
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) } // unique ids
    val df = rows.toDF("g", "v", "id")
    val got = Ranking.topNPerGroup(df, Seq("g"),
        Seq(col("v").desc, col("id").asc), 5)
      .select("g", "id").collect().map(r => (r.getInt(0), r.getLong(2 - 1))).toSet
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(5).map(r => (g, r._3))
    }.toSet
    assert(got == ref)
  }

  test("tagHoldout matches the md5-threshold reference row-for-row") {
    val keys = sampled(Gen.listOfN(500, Gen.choose(0L, 1000000L)), seed = 5L).distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    def refTag(k: Long): String = {
      val hex = md.digest(s"7:$k".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      if (hex < f"${math.floor(0.3 * 4294967296.0).toLong}%08x") "test" else "train"
    }
    val got = graft.ml.Split.tagHoldout(keys.toDF("id"), "id", 0.3, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    keys.foreach(k => assert(got(k) == refTag(k), s"key $k"))
  }

  test("connectedComponents equals a union-find reference on random graphs") {
    // reference: classic union-find with path compression
    def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    // note: union-find roots are minimal per component here because the
    // larger root is always attached beneath the smaller one
    for (seed <- 11L to 13L) {
      val edges = sampled(Gen.listOfN(120,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 60L))
          // no suchThat (listOfN aborts on retries): remap self-loops
          .map { case (a, b) => if (a == b) (a, (b + 1) % 61) else (a, b) }),
        seed)
      val expected = ufComponents(edges)
      val got = graft.ops.Graph.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("ntileExact equals the window ntile on random sizes and k") {
    import org.apache.spark.sql.expressions.Window
    for ((n, k, seed) <- Seq((997, 7, 21L), (64, 10, 22L), (1500, 4, 23L))) {
      val xs = sampled(Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0)), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = xs.toDF("id", "v")
      val expected = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val got = Ranking.ntileExact(df, Seq(col("v"), col("id")), k, "b")
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got == expected, s"n=$n k=$k")
    }
  }

  test("runningSum equals a sequential fold on random values") {
    val xs = sampled(Gen.listOfN(1200, Gen.chooseNum(-50L, 50L)), seed = 31L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val expected = xs.sortBy(_._1).scanLeft(((-1L), 0L)) {
      case ((_, acc), (id, v)) => (id, acc + v)
    }.drop(1).toMap
    val got = graft.ops.Prefix.runningSum(
      xs.toDF("id", "v"), Seq(col("id")), col("v"), "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("runningSums computes every column in one pass, equal to folds") {
    val xs = sampled(Gen.listOfN(800, Gen.zip(
      Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 9L))), seed = 41L)
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    def fold(sel: ((Long, Long, Long)) => Long): Map[Long, Long] =
      xs.sortBy(_._1).scanLeft((-1L, 0L)) {
        case ((_, acc), t) => (t._1, acc + sel(t))
      }.drop(1).toMap
    val got = graft.ops.Prefix.runningSums(
      xs.toDF("id", "a", "b"), Seq(col("id")),
      Seq(col("a") -> "ca", col("b") -> "cb"))
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(got.view.mapValues(_._1).toMap == fold(_._2))
    assert(got.view.mapValues(_._2).toMap == fold(_._3))
  }

  test("topKRanked equals the global row_number window on random relations") {
    import org.apache.spark.sql.expressions.Window
    val xs = sampled(Gen.listOfN(500, Gen.chooseNum(0L, 120L)), seed = 43L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = xs.toDF("id", "v").repartition(7)
    for (k <- Seq(1, 10, 600)) { // k > n exercises the short-relation edge
      val got = Ranking.topKRanked(df, Seq("v" -> true, "id" -> false), k)
        .collect().map(r => (r.getInt(2), r.getLong(0), r.getLong(1))).sorted
      val w = Window.orderBy(col("v").desc, col("id").asc)
      val expected = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .collect().map(r => (r.getInt(2), r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq, s"k=$k")
    }
  }

  test("triangleCount equals a brute-force reference on random graphs") {
    def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
      val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).toSet
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      nodes.combinations(3).count { case Seq(x, y, z) =>
        es((x, y)) && es((y, z)) && es((x, z))
      }
    }
    for (seed <- 41L to 43L) {
      val edges = sampled(Gen.listOfN(80,
        Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L))
          .map { case (a, b) => if (a == b) (a, (b + 1) % 26) else (a, b) }),
        seed)
      val expected = bruteTriangles(edges)
      val got = graft.ops.Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
        .collect()(0).getLong(0)
      assert(got == expected, s"seed=$seed expected=$expected got=$got")
    }
  }

  test("redactPii is idempotent and digit-run boundaries are exact") {
    val gen = Gen.listOfN(60, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.chooseNum(0, 14).map(n => "9" * n),          // digit runs 0..14
      Gen.const("a@b.co"), Gen.const("1.2.3.4"), Gen.const("010-123-4567")))
    for (seed <- 51L to 52L) {
      val texts = sampled(gen, seed).map(_.mkString(" "))
      val df = Seq(texts.mkString(" ")).toDF("t")
      val once = df.select(TextOps.redactPii(col("t"))).head.getString(0)
      val twice = Seq(once).toDF("t")
        .select(TextOps.redactPii(col("t"))).head.getString(0)
      assert(once == twice, "redaction must be a fixpoint")
      // digit runs of ≥8 never survive redaction
      assert("[0-9]{8,}".r.findFirstIn(once).isEmpty)
    }
  }

  test("resampleWithGapFill spine is dense and complete per key") {
    val gen = Gen.listOfN(200, Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 500000L)))
    for (seed <- 61L to 62L) {
      val rows = sampled(gen, seed).map { case (k, s) =>
        (k, new java.sql.Timestamp(1700000000000L + s * 1000), 1.0)
      }
      val out = graft.ops.Temporal.resampleWithGapFill(
        rows.toDF("k", "ts", "v"), "k", "ts", "v", 3600L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // per key: buckets are exactly [min..max] with no holes or dups
      out.groupBy(_._1).foreach { case (k, bs) =>
        val buckets = bs.map(_._2).sorted
        assert(buckets.distinct == buckets, s"$k has duplicate buckets")
        assert(buckets == (buckets.head to buckets.last),
          s"$k spine has holes")
      }
    }
  }

  test("TopKBuffer random inserts + merges equal the sorted-take reference") {
    import graft.expressions.TopKBuffer
    // reference order: score DESC, id ASC — the aggregate's documented
    // total order
    def refTop(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
      xs.sortBy { case (s, id) => (-s, id) }.take(k)
    def drain(b: TopKBuffer): Seq[(Double, Long)] =
      (0 until b.n).map(i => (b.scores(i), b.ids(i)))
        .sortBy { case (s, id) => (-s, id) }
    val pairGen = for {
      s <- Gen.oneOf(Gen.chooseNum(-1e3, 1e3), Gen.oneOf(0.0, 1.0, -1.0))
      id <- Gen.chooseNum(0L, 50L) // small id space → frequent score ties
    } yield (s, id)
    (1 to 30).foreach { trial =>
      val xs = sampled(Gen.listOfN(200, pairGen), seed = 100L + trial)
      val k = 1 + trial % 7
      // single-buffer path
      val one = new TopKBuffer(k)
      xs.foreach { case (s, id) => one.insert(s, id) }
      assert(drain(one) == refTop(xs, k), s"single buffer, trial $trial")
      // split into random chunk buffers, then merge — the partial-agg path
      val nChunks = 1 + trial % 5
      val merged = xs.grouped(math.max(1, xs.size / nChunks)).map { chunk =>
        val b = new TopKBuffer(k)
        chunk.foreach { case (s, id) => b.insert(s, id) }
        b
      }.reduce { (a, b) =>
        (0 until b.n).foreach(i => a.insert(b.scores(i), b.ids(i)))
        a
      }
      assert(drain(merged) == refTop(xs, k), s"merged buffers, trial $trial")
    }
  }
}
