package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Temporal
import graft.text.{Retrieval, TextOps}

/** Round-3 pipeline operators: PII redaction, repetition filtering,
  * decontamination, BM25, gap fill. */
class PipeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii scrubs emails, IPs, phones, and long digit runs") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "host 192.168.001.255 up",
      "call 010-1234-5678 today",
      "card 12345678901234",
      "clean text stays put 1234567"
    ).toDF("text").select(TextOps.redactPii(col("text")).as("red"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "host <IP> up")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "card <NUM>")
    assert(out(4) == "clean text stays put 1234567") // 7 digits: kept
  }

  test("dupNgramFraction: 0 for all-distinct, rises with repetition") {
    val df = Seq(
      ("a b c d e f g h", "uniq"),            // all 3-grams distinct
      ("a b c a b c a b c a b c", "loop"),    // heavy repetition
      ("a b", "short")                        // < n tokens → single shingle
    ).toDF("text", "tag")
    val out = df.select(col("tag"),
        TextOps.dupNgramFraction(col("text"), 3).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("uniq") == 0.0)
    assert(out("loop") > 0.5)
    assert(out("short") == 0.0)
  }

  test("bm25 ranks the term-bearing doc first and respects df weighting") {
    // 'rare' appears in 1 doc, 'common' in 3 of 4 — rare must outscore
    val docs = Seq(
      (0L, "rare word plus filler filler filler"),
      (1L, "common word plus filler filler filler"),
      (2L, "common stuff here filler filler filler"),
      (3L, "common other text filler filler filler")
    ).toDF("doc_id", "text")
    val scored = Retrieval.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(0) > scored(1)) // rare term beats common term at equal tf/dl
    assert(scored.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("ngramContamination flags the doc copied into the eval set") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val eval_ = Seq(
      (90L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = Retrieval.ngramContamination(train, eval_, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toList
    val m = out.map(t => t._1 -> t).toMap
    assert(m(10L)._3 == 1.0) // every 3-gram contaminated
    assert(m(11L)._2 == 0L && m(11L)._3 == 0.0)
  }

  test("triangleCount is exact on a known graph, any orientation") {
    // K4 on {1,2,3,4} (4 triangles) + pendant edge (4,5) + dup/reversed edges
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L), (2L, 1L), // reversed duplicates
      (4L, 5L)
    ).toDF("s", "t")
    val n = graft.ops.Graph.triangleCount(edges, "s", "t")
      .collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("resampleWithGapFill emits empty buckets and forward-fills") {
    val df = Seq(
      ("k", "2024-01-01 00:10:00", 10.0),
      ("k", "2024-01-01 00:20:00", 5.0),
      // hour 1 empty
      ("k", "2024-01-01 02:30:00", 7.0)
    ).toDF("key", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = Temporal.resampleWithGapFill(df, "key", "ts", "v", 3600L)
      .orderBy("bucket").collect()
    assert(out.length == 3) // three consecutive hours, gap present
    assert(out(0).getLong(2) == 2 && out(0).getDouble(4) == 15.0)
    assert(out(1).getLong(2) == 0)          // the empty hour
    assert(out(1).isNullAt(3))              // no bucket_sum
    assert(out(1).getDouble(4) == 15.0)     // forward-filled
    assert(out(2).getLong(2) == 1 && out(2).getDouble(4) == 7.0)
  }
}
