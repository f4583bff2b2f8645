package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{Bpe, NbClassifier}

/** BPE tokenizer training + the NB quality-classifier distillation.
  * The oracle queries pin the cross-engine hashes; these tests pin the
  * ALGORITHM against independent computations and its distribution
  * invariants. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The classic BPE teaching corpus (Sennrich et al. §3.2 shape):
    * {low ×5, lower ×2, newest ×6, widest ×3}. */
  private def corpus = Seq(
    ("low " * 5).trim, ("lower " * 2).trim,
    ("newest " * 6).trim, ("widest " * 3).trim)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  /** Independent in-test reference: pure-Scala BPE with the same merge
    * semantics (replace-to-fixpoint on the space-sentineled form) but a
    * completely separate code path (driver Maps, no Spark). */
  private def referenceBpe(words: Map[String, Long], k: Int)
  : Seq[(String, Long)] = {
    var vocab = words.map { case (w, f) =>
      (" " + w.toCharArray.mkString("", " ", " " + Bpe.Eow + " "), f)
    }
    (1 to k).map { _ =>
      val pairCounts = vocab.toSeq
        .flatMap { case (sym, f) =>
          val s = sym.trim.split(" ")
          s.zip(s.tail).map { case (a, b) => (s"$a $b", f) }
        }
        .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val (pair, cnt) = pairCounts.toSeq.minBy { case (p, c) => (-c, p) }
      val (pat, rep) = (s" $pair ", s" ${pair.replace(" ", "")} ")
      vocab = vocab.map { case (sym, f) =>
        ((1 to Bpe.FixIters).foldLeft(sym)((x, _) => x.replace(pat, rep)), f)
      }
      (pair, cnt)
    }
  }

  test("learned merges match the independent reference on the classic corpus") {
    val model = Bpe.train(corpus, "text", 6)
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expected = referenceBpe(wf, 6)
    assert(model.merges.map(m => (m.pair, m.count)) == expected)
    // the classic first merges: "e s" (9 = newest 6 + widest 3) then "es t"
    assert(model.merges.head.pair == "e s" && model.merges.head.count == 9)
    assert(model.merges(1).pair == "es t")
  }

  test("merge application is at fixpoint (one more replace is identity)") {
    val model = Bpe.train(corpus, "text", 6)
    val v0 = Bpe.wordFreq(corpus, "text")
      .select(col("w"), Bpe.symbolize(col("w")).as("sym"))
    val diff = v0
      .select(col("w"), Bpe.applyMerges(col("sym"), model.merges).as("a"),
        model.merges.foldLeft(Bpe.symbolize(col("w")))((c, m) =>
          (1 to Bpe.FixIters + 1).foldLeft(c)((x, _) =>
            replace(x, lit(m.pat), lit(m.rep)))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("training is invariant to partitioning (exact-count argmax)") {
    val m1 = Bpe.train(corpus.repartition(1), "text", 5).merges
    val m2 = Bpe.train(corpus.repartition(7), "text", 5).merges
    assert(m1 == m2)
  }

  test("encode conserves symbols: n_bpe_tokens = chars + words - merges applied") {
    val model = Bpe.train(corpus, "text", 4)
    // every merge application reduces a word's symbol count by exactly
    // 1, and on this corpus (no self-adjacent pairs ever arise) the
    // selected pair COUNT equals the number of applications — so the
    // corpus-total identity checks encode end to end without trusting
    // the trainer: sum over tokens of nsym = base symbols - Σ counts.
    val enc = Bpe.encode(model, corpus, "doc_id", "text")
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val base = wf.map { case (w, f) => (w.length + 1) * f }.sum
    val merged = model.merges.map(_.count).sum
    assert(enc == base - merged)
  }

  test("vocabFor rebuilds exactly the trainer's incremental vocabulary") {
    val model = Bpe.train(corpus, "text", 6)
    val a = model.vocab.select("w", "sym", "nsym").orderBy("w").collect().toSeq
    val b = Bpe.vocabFor(corpus, "text", model.merges)
      .select("w", "sym", "nsym").orderBy("w").collect().toSeq
    assert(a == b)
  }

  test("NB classifier recovers a planted two-class signal") {
    // class A docs speak {alpha beta gamma}, class B {delta epsilon zeta},
    // with shared filler; NB on token counts must separate them.
    val docs = (0 until 40).map { i =>
      val cls = if (i % 2 == 0) "A" else "B"
      val words = if (cls == "A") "alpha beta gamma alpha" else "delta epsilon zeta delta"
      (i.toLong, s"$words filler common $i", cls)
    }.toDF("doc_id", "text", "cls")
    val m = NbClassifier.fit(docs, "doc_id", "text", "cls")
    val acc = docs
      .join(NbClassifier.predict(m, docs, "doc_id", "text"), Seq("doc_id"))
      .agg(avg(when(col("cls") === col("pred"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"NB planted-signal accuracy $acc")
  }

  test("NB scores are partitioning-invariant (DECIMAL log sums)") {
    val docs = (0 until 30).map(i =>
      (i.toLong, s"tok${i % 5} tok${i % 3} tok${i % 7} filler", if (i < 15) "x" else "y"))
      .toDF("doc_id", "text", "cls")
    val m = NbClassifier.fit(docs.repartition(11), "doc_id", "text", "cls")
    val s1 = NbClassifier.scores(m, docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id", "cand").collect().toSeq
    val s2 = NbClassifier.scores(m, docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id", "cand").collect().toSeq
    assert(s1 == s2)
  }
}
