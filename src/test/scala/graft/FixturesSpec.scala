package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Fixtures

/** The planted-id disjointness invariant. Round 12's fixture-stride bug
  * (planted +100000 aliased real ids at sf10, degenerating seven dedup
  * fixtures for eleven rounds with no differential gate able to see it)
  * motivates asserting the invariant AT ASSEMBLY; this spec replays the
  * regression shape and pins the helper's behavior. */
class FixturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a non-aliasing stride passes and the union has 2n distinct ids") {
    val df = (0L until 50L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val ok = Fixtures.assertNoAlias(df, "doc_id", stride = 100L)
    val doubled = ok.unionByName(
      ok.select((col("doc_id") + lit(100L)).as("doc_id"), col("text")))
    assert(doubled.select("doc_id").distinct().count() === 100L)
  }

  test("the sf10 regression shape — stride inside the id domain — dies loudly") {
    // ids 0..499999 with stride 100000: planted 100000..599999 aliases
    // 100000..499999 — exactly the round-12 bug, caught at assembly now
    val df = Seq(0L, 100001L, 499999L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Fixtures.assertNoAlias(df, "doc_id", stride = 100000L)
    }
    assert(e.getMessage.contains("aliases"))
    assert(e.getMessage.contains("[0, 499999]"))
  }

  test("the catalog stride clears the sf10 id domain with margin") {
    // the largest real id domain any sf the driver reads produces is the
    // sf10 documents table (500k rows, ids < 1e6) — two orders below the
    // shared stride; a future sf1000 (50M docs) still clears it
    val df = Seq(0L, 50000000L).toDF("doc_id")
    Fixtures.assertNoAlias(df, "doc_id") // must not throw at Stride=1e8
    assert(Fixtures.Stride === 100000000L)
  }

  test("empty and negative-id relations are handled") {
    Fixtures.assertNoAlias(Seq.empty[Long].toDF("doc_id"), "doc_id")
    // negative ids: domain WIDTH is what matters, not the max alone —
    // [-60, 60] with stride 100 would plant [40, 160] over real rows
    val neg = Seq(-60L, 60L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Fixtures.assertNoAlias(neg, "doc_id", stride = 100L)
    }
    Fixtures.assertNoAlias(neg, "doc_id", stride = 121L)
  }
}
