package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{Dsir, TextOps}

/** DSIR importance resampling + the Gopher rule set. The oracle queries
  * pin the cross-engine hashes; these tests pin the ALGORITHM against an
  * independent pure-Scala computation and its distribution invariants. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Target looks like English prose; raw adds gibberish docs. */
  private val targetTexts = Seq(
    "the cat sat on the mat and the dog sat too",
    "the quick brown fox jumps over the lazy dog and runs",
    "a cat and a dog have a long day in the sun")
  private val junkTexts = Seq(
    "zzq qqz xkcd zzq qqz zzq vvv kkk zzq qqz",
    "9hf3 jx0 qq9 zz1 9hf3 jx0 qq9 zz1 9hf3 jx0")

  private def corpus = (targetTexts ++ junkTexts).zipWithIndex
    .map { case (t, i) =>
      (i.toLong, t, if (i < targetTexts.size) "tgt" else "junk")
    }
    .toDF("doc_id", "text", "source")

  /** Pure-Scala reference: same md5 bucket, same add-one smoothing, same
    * HALF_UP 12-decimal rounding as the Spark decimal cast — a separate
    * code path (driver Maps, no Spark). */
  private def referenceWeights(
      docs: Seq[(Long, String)], targetIds: Set[Long])
  : Map[Long, BigDecimal] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def feats(t: String): Seq[String] = {
      val w = TextOps.normTokens(t).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Long =
      java.lang.Long.parseLong(TextOps.md5Hex(md, f).take(8), 16) %
        Dsir.Buckets
    val all = docs.flatMap { case (id, t) => feats(t).map(f => (id, bucket(f))) }
    val tgt = all.filter { case (id, _) => targetIds(id) }
    def dist(xs: Seq[(Long, Long)]): Map[Long, Double] = {
      val c = xs.groupBy(_._2).map { case (b, g) => (b, g.size.toLong) }
      val n = xs.size.toLong
      (0L until Dsir.Buckets).map(b =>
        b -> (c.getOrElse(b, 0L) + 1).toDouble / (n + Dsir.Buckets)).toMap
    }
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val (p, q) = (dist(tgt), dist(all))
    val lr = (0L until Dsir.Buckets)
      .map(b => b -> (dec12(math.log(p(b))) - dec12(math.log(q(b))))).toMap
    all.groupBy(_._1).map { case (id, fs) =>
      id -> fs.map { case (_, b) => lr(b) }.sum
    }
  }

  test("importance weights match the pure-Scala reference exactly") {
    val docs = corpus
    val target = docs.filter(col("source") === "tgt")
    val model = Dsir.logRatios(target, docs, "doc_id", "text")
    val got = Dsir.importanceWeights(docs, model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(2)))).toMap
    val want = referenceWeights(
      (targetTexts ++ junkTexts).zipWithIndex.map { case (t, i) => (i.toLong, t) },
      targetIds = targetTexts.indices.map(_.toLong).toSet)
    assert(got.keySet === want.keySet)
    for ((id, w) <- want) assert(got(id) === w, s"doc $id")
  }

  test("target-like docs outrank gibberish; weights are partition-invariant") {
    val docs = corpus
    val target = docs.filter(col("source") === "tgt")
    val model = Dsir.logRatios(target, docs, "doc_id", "text")
    val w = Dsir.importanceWeights(docs, model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDecimal(2).doubleValue())).toMap
    val tgtMin = targetTexts.indices.map(i => w(i.toLong)).min
    val junkMax = junkTexts.indices.map(i => w((targetTexts.size + i).toLong)).max
    assert(tgtMin > junkMax,
      s"target docs should outweigh junk: $tgtMin <= $junkMax")
    val w2 = Dsir.importanceWeights(
        docs.repartition(7, col("text")), model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDecimal(2).doubleValue())).toMap
    assert(w2 === w)
  }

  test("gumbel resample is deterministic and biased toward the target") {
    val docs = corpus
    val target = docs.filter(col("source") === "tgt")
    val pick = Dsir.resample(docs, target, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(pick.size === 3)
    val again = Dsir.resample(docs, target, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(again === pick)
  }

  test("resample releases its feature cache — only the k-row result stays") {
    graft.ops.Leaks.sweep(spark)
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = corpus
    val target = docs.filter(col("source") === "tgt")
    val out = Dsir.resample(docs, target, "doc_id", "text", 3)
    // the corpus-sized rawFeats persist must be GONE at return; the one
    // new resident RDD is the eager checkpoint of the 3-row selection
    val added = spark.sparkContext.getPersistentRDDs.size - before
    assert(added === 1,
      s"expected only the checkpointed result resident, got $added new RDDs")
    assert(out.count() === 3)
    graft.ops.Leaks.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  // ---- Gopher rules ----------------------------------------------------

  private def flagsOf(text: String): Map[String, Boolean] = {
    val row = TextOps.gopherFlags(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    Seq("f_word_count", "f_word_len", "f_symbol", "f_bullet", "f_ellipsis",
      "f_alpha", "f_stop")
      .map(f => f -> row.getAs[Boolean](f)).toMap
  }

  private val goodDoc = (
    "the cat and the dog have a fine day to walk with all of us " +
      "and that is how it should be for every single one of them " +
      "because the sun is out and the grass is green and the air " +
      "is warm and we have nothing else to do but enjoy the walk").trim

  test("a well-formed document passes all seven Gopher rules") {
    val f = flagsOf(goodDoc)
    assert(f.values.forall(_ == false), f.toString)
  }

  test("each Gopher rule fires on its designed violation") {
    assert(flagsOf("too few words here")("f_word_count"))
    assert(flagsOf(("ab " * 60).trim + " the of and be")("f_word_len"))
    assert(flagsOf(goodDoc + (" #" * 20))("f_symbol"))
    assert(flagsOf((1 to 10).map(i => s"- item number $i").mkString("\n"))("f_bullet"))
    assert(flagsOf((1 to 10).map(i => s"line $i trails off...").mkString("\n"))("f_ellipsis"))
    assert(flagsOf(("1 2 3 4 5 6 7 8 9 10 " * 6).trim + " the of")("f_alpha"))
    assert(flagsOf(("lorem ipsum dolor sit amet " * 12).trim)("f_stop"))
  }

  test("empty-ish and single-line docs do not crash the line rules") {
    val f = flagsOf("word")
    assert(f("f_word_count"))
    assert(!f("f_bullet") && !f("f_ellipsis"))
  }
}
