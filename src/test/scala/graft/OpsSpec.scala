package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("valueCounts counts and normalizes") {
    val df = Seq("a", "b", "a", "a", "c").toDF("x")
    val vc = Relational.valueCounts(df, "x").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vc.toSeq == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
    val pct = Relational.valueCounts(df, "x", normalize = true)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(math.abs(pct("a") - 60.0) < 1e-12)
  }

  test("crosstab with explicit domain fills zeros") {
    val df = Seq(("r1", "x"), ("r1", "x"), ("r2", "y")).toDF("a", "b")
    val ct = Relational.crosstab(df, "a", "b", Seq("x", "y", "z")).collect()
    val r1 = ct.find(_.getString(0) == "r1").get
    assert(r1.getLong(1) == 2 && r1.getLong(2) == 0 && r1.getLong(3) == 0)
    val r2 = ct.find(_.getString(0) == "r2").get
    assert(r2.getLong(1) == 0 && r2.getLong(2) == 1)
  }

  test("crosstabWithMargins keeps a genuine NULL key distinct from the All row") {
    val df = Seq((Some("r1"), "x"), (Some("r1"), "y"), (None, "x"), (None, "x"))
      .toDF("a", "b")
    val ct = Relational.crosstabWithMargins(df, "a", "b", Seq("x", "y"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    // NULL-key rows aggregate under a null label, NOT under "All"
    assert(ct.contains((None, 2L, 0L, 2L)))
    assert(ct.contains((Some("r1"), 1L, 1L, 2L)))
    assert(ct.contains((Some("All"), 3L, 1L, 4L)))
    assert(ct.length == 3)
  }

  test("cut uses pandas (lo, hi] semantics") {
    val df = Seq(0.0, 2.5, 2.51, 5.0, 7.0).toDF("v")
      .select(Cleaning.cut(col("v"), Seq(0, 2.5, 5), Seq("lo", "hi")).as("bin"))
    assert(df.collect().map(_.getString(0)) === Array(null, "lo", "hi", "hi", null))
  }

  test("rewriteSentinels maps codes to -1/null and passes others") {
    val df = Seq(1.0, 8.0, 9.0, 3.5).toDF("v")
      .select(Cleaning.rewriteSentinels(col("v"), toMinusOne = Seq(8), toNull = Seq(9)).as("o"))
    val out = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out === Array(Some(1.0), Some(-1.0), None, Some(3.5)))
  }

  test("binarize threshold strict/non-strict") {
    val df = Seq(0.5, 0.4, 0.6).toDF("v")
    val ge = df.select(Cleaning.binarize(col("v"), 0.5).as("o")).collect().map(_.getInt(0))
    val gt = df.select(Cleaning.binarize(col("v"), 0.5, strict = true).as("o")).collect().map(_.getInt(0))
    assert(ge === Array(1, 0, 1) && gt === Array(0, 0, 1))
  }

  test("modePerGroup breaks ties on smallest value") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "a"), ("h", "z"))
      .toDF("k", "v")
    val m = Ranking.modePerGroup(df, Seq("k"), "v").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(m == Map("g" -> "a", "h" -> "z"))
  }

  test("topNPerGroup returns n rows per group in order") {
    val df = Seq(("g", 3), ("g", 1), ("g", 2), ("h", 9)).toDF("k", "v")
    val t = Ranking.topNPerGroup(df, Seq("k"), Seq(col("v").desc), 2)
      .select("k", "v", "rn").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(t.toSet == Set(("g", 3, 1), ("g", 2, 2), ("h", 9, 1)))
  }

  test("unionOnCommonColumns keeps right frame's column order") {
    val a = Seq((1, "x", 9.0)).toDF("id", "s", "w")
    val b = Seq((8.0, 2, "y")).toDF("w", "id", "s")
    val u = Relational.unionOnCommonColumns(a, b)
    assert(u.columns.toSeq == Seq("w", "id", "s"))
    assert(u.count() == 2)
  }

  test("nullRates + dropMostlyNullCols gate") {
    val df = Seq((Some(1.0), None: Option[Double]), (Some(2.0), Some(1.0)),
      (None, None), (Some(3.0), None)).toDF("mostly_ok", "mostly_null")
    val rates = Relational.nullRates(df, Seq("mostly_ok", "mostly_null"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("mostly_ok") == 0.25 && rates("mostly_null") == 0.75)
    val kept = Relational.dropMostlyNullCols(df, Seq("mostly_ok", "mostly_null"), 0.75)
    assert(kept.columns.toSeq == Seq("mostly_ok"))
  }

  test("rowNullCount sums per-row nulls") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, None))
      .toDF("a", "b")
      .select(Relational.rowNullCount(Seq("a", "b")).as("n"))
    assert(df.collect().map(_.getInt(0)) === Array(1, 2))
  }

  test("melt unpivots to long form") {
    val df = Seq(("k", 1.0, 2.0)).toDF("id", "x", "y")
    val m = Relational.melt(df, Seq("id"), Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(m.toSet == Set(("k", "x", 1.0), ("k", "y", 2.0)))
  }

  test("dsum is exact and order-independent") {
    val xs = (1 to 10000).map(i => i * 0.1)
    val expected = BigDecimal(10000 * 10001 / 2) * BigDecimal("0.1")
    val got = xs.toDF("v").repartition(7).agg(Num.dsum(col("v"))).head.getDouble(0)
    assert(got == expected.toDouble)
  }

  def t(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("asofJoin picks the latest prior right row, exact matches included") {
    val left = Seq((1L, 1L, t(30)), (2L, 1L, t(90)), (3L, 2L, t(50)), (4L, 3L, t(10)))
      .toDF("event_id", "k", "lts")
    val right = Seq(
      (1L, t(10), 100.0, 10L), (1L, t(30), 200.0, 11L), // exact match at 30
      (1L, t(30), 250.0, 12L),                          // tie at 30 → max id wins
      (1L, t(80), 300.0, 13L), (2L, t(60), 400.0, 14L)) // k=2 after 50 → no match
      .toDF("k", "rts", "rv", "rid")
    val out = Temporal.asofJoin(left, right, "k", "lts", "rts", Seq("rv"), "rid")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L) == Some(250.0)) // exact-time tie, last rid wins
    assert(out(2L) == Some(300.0))
    assert(out(3L).isEmpty)        // only later right rows
    assert(out(4L).isEmpty)        // no right rows for key
  }

  test("intervalJoinBinned equals the naive range join") {
    val left = (1 to 200).map(i => (i.toLong % 5, t(i), i.toLong)).toDF("k", "lts", "lid")
    val right = (1 to 200).map(i => (i.toLong % 5, t(i * 2 % 240), i * 1.0)).toDF("k", "rts", "rv")
    val binned = Temporal.intervalJoinBinned(left, right, "k", "lts", "rts", 1800)
      .select("lid", "rv").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val naive = left.join(right, Seq("k"))
      .filter(col("rts") <= col("lts") &&
        col("rts") >= col("lts") - expr("INTERVAL 1800 SECOND"))
      .select("lid", "rv").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(binned == naive && binned.nonEmpty)
  }

  test("scd2 intervals tile each key's timeline; exactly one current row") {
    val rows = Seq((1L, t(10), 101L, "a"), (1L, t(30), 102L, "b"),
      (1L, t(20), 103L, "c"), (2L, t(5), 104L, "x")).toDF("k", "ts", "id", "v")
    // columns: k(0), valid_from(1), id(2), v(3), valid_to(4), is_current(5)
    val h = Temporal.scd2(rows, "k", "ts", "id")
      .orderBy("k", "valid_from", "id").collect()
    // per key: each valid_to equals the NEXT valid_from (no gaps, no overlap)
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(3)).toSeq == Seq("a", "c", "b")) // time order
    assert(k1.init.map(r => r.getTimestamp(4)).toSeq ==
      k1.tail.map(r => r.getTimestamp(1)).toSeq)
    // exactly one open-ended current row per key
    assert(h.count(r => r.getInt(5) == 1) == 2)
    assert(h.filter(r => r.getInt(5) == 1).forall(r => r.isNullAt(4)))
  }

  test("pmiBigrams scores a planted collocation above independent pairs") {
    // "new york" always adjacent; "the" ubiquitous → low ratio
    val docs = (1 to 30).map(i => (i.toLong,
      s"the city of new york item$i the end")).toDF("doc_id", "text")
    val pmi = graft.text.TextOps.pmiBigrams(docs, "text", minCount = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val total = 30 * 8.0
    val (nAb, nA, nB, ratio) = pmi(("new", "york"))
    assert(nAb == 30 && nA == 30 && nB == 30)
    assert(ratio == 30.0 * total / (30.0 * 30.0))
    // ubiquitous-word pair scores strictly lower
    assert(pmi(("the", "city"))._4 < ratio)
    // min-support pruned: no pair with < 5 occurrences survives
    assert(pmi.values.forall(_._1 >= 5))
  }
}
