package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Property bounds for the approximate sketch operators (no cross-engine
  * oracle exists by construction — estimates are sketch-library-specific).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("HLL per-group distinct is within 5% of exact") {
    val e = graft.core.Tables(spark, sfDir, "events")
    val approx = Sketches.approxDistinctPerGroup(e, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1.0, 0.05 * n),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("HLL sketches merge consistently (union == whole-relation estimate)") {
    val e = graft.core.Tables(spark, sfDir, "events")
    val merged = Sketches.mergedDistinct(e, "event_type", "user_id")
      .collect()(0).getLong(0)
    val whole = e.agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("n"))
      .collect()(0).getLong(0)
    assert(merged == whole, s"merged=$merged whole=$whole")
  }

  test("approx_top_k finds the true heavy hitters in order") {
    val e = graft.core.Tables(spark, sfDir, "events")
    val top = Sketches.approxTopK(e, "event_type", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // five distinct types, no capacity pressure: estimates are exact here
    assert(top.toSeq == exact.toSeq)
  }

  test("CMS never underestimates and bounds collision overestimate") {
    val e = graft.core.Tables(spark, sfDir, "events")
    val n = e.count()
    val sketch = Sketches.countMinSketch(e, "user_id")
    val exact = e.groupBy("user_id").agg(count(lit(1)).as("true_count"))
    val est = Sketches.cmsEstimate(sketch, exact.select("user_id"), "user_id")
    val joined = exact.join(est, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    joined.foreach { case (u, t, s) =>
      assert(s >= t, s"user $u: est $s < true $t — CMS must never undercount")
      // standard guarantee: overestimate ≤ eN/w with prob ≥ 1−e^−d per
      // item; deterministic hashes here, so assert the 3× slack bound
      assert(s - t <= math.max(1L, 3L * n / 512),
        s"user $u: est $s vs true $t exceeds collision bound")
    }
  }

  test("CMS estimates unseen items as 0 and includes empty cells in the min") {
    val seen = Seq("a", "a", "b").toDF("k")
    val sketch = Sketches.countMinSketch(seen, "k", depth = 4, width = 512)
    // probe one seen and one never-inserted item: the unseen item's cells
    // are all empty → est 0 (not a dropped row, not an inner-join miss)
    val probes = Seq("a", "zzz_never_inserted").toDF("k")
    val est = Sketches.cmsEstimate(sketch, probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set("a", "zzz_never_inserted"))
    assert(est("a") >= 2L)
    assert(est("zzz_never_inserted") == 0L,
      "all-empty cells must estimate 0, not vanish from the output")
  }

  test("constraintReport on an empty table passes every non-uniqueness check") {
    import graft.ops.Checks
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val rep = Checks.constraintReport(empty, Seq(
        Checks.complete("k"), Checks.inRange("v", 0, 1),
        Checks.unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rep.length == 3)
    rep.foreach { case (n, viol, total, pass) =>
      assert(viol == 0L && total == 0L && pass, s"$n must pass on empty input")
    }
  }

  test("CMS cells merge by addition (partitioned maintenance)") {
    val e = graft.core.Tables(spark, sfDir, "events")
    val a = Sketches.countMinSketch(e.filter(col("event_id") % 2 === 0), "user_id")
    val b = Sketches.countMinSketch(e.filter(col("event_id") % 2 === 1), "user_id")
    val merged = a.unionByName(b).groupBy("row", "bucket")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = Sketches.countMinSketch(e, "user_id")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged == whole)
  }
}
