package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the step
  * beyond [[TextOps.bpeishTokens]]' fixed regex: learn the merge table
  * from the corpus itself, the way real pre-training pipelines build
  * their subword vocabulary.
  *
  * Scale shape — the whole point of the design: the corpus is read
  * EXACTLY ONCE (one word-frequency aggregation with map-side combine;
  * the exchange carries (word, count), never text). Every one of the K
  * merge rounds then operates on the VOCABULARY relation — bounded by
  * distinct word forms, not corpus size — so training cost is flat in
  * corpus bytes past that first pass. At 100 TB that is the difference
  * between a tokenizer you can train nightly and one you cannot train
  * at all. Encoding is a broadcast-map stage: the fitted vocabulary
  * (word → subword count) broadcasts and the corpus never shuffles.
  *
  * Determinism discipline (the md5-split/Lloyd's-chain precedent): the
  * argmax merge is (count DESC, pair ASC) — total order, no RNG; merge
  * APPLICATION is `replace`-to-fixpoint, a pure string function with
  * identical semantics in Spark and DuckDB (both replace all
  * occurrences left-to-right, non-overlapping), so the oracle replays
  * the entire fit bit-for-bit as a K-stage CTE chain.
  *
  * Word forms are symbolized as single-space-separated characters with
  * a sentinel leading/trailing space and an end-of-word marker:
  * "low" → " l o w $ ". A merge of pair "l o" is replace(" l o ", " lo ").
  * The space sentinels make symbol boundaries unambiguous (symbols
  * never contain spaces); the end-of-word marker keeps suffix merges
  * ("er$") distinct from infix ones ("er"), as in the original
  * algorithm. Only `^[a-z0-9]+$` word forms train/encode — the marker
  * can therefore never collide with corpus text.
  *
  * Ref: teamProject/preprocessing uses fixed tokenization only; this is
  * the training-data-pipeline extension surface (SURVEY §2 "text
  * analysis" + the builder prompt's token-counting line, completed to
  * tokenizer training).
  */
object Bpe {

  /** End-of-word marker symbol (never occurs in `[a-z0-9]+` words). */
  val Eow = "$"

  /** Merge application = `replace` iterated to fixpoint. A single
    * left-to-right pass already merges every occurrence of a pair
    * (a, b) with a ≠ b; only runs of a self-pair (a, a, a, …) need
    * iteration, and each pass at least halves the run, so 6 passes
    * cover words up to 64 symbols. One extra pass is always identity —
    * BpeSpec pins that. */
  val FixIters = 6

  /** One learned merge: `pair` is the space-separated symbol pair,
    * `count` its corpus-weighted frequency at selection time. */
  final case class Merge(rank: Int, pair: String, count: Long) {
    def merged: String = pair.replace(" ", "")
    def pat: String = s" $pair "
    def rep: String = s" $merged "
  }

  /** (w, freq) — the single corpus pass. Vocabulary-bounded output. */
  def wordFreq(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(TextOps.tokens(TextOps.normalizeText(col(textCol))))
        .as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** " l o w $ " — space-sentineled character symbolization. */
  def symbolize(w: Column): Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1 "), lit(Eow + " "))

  /** Symbol array of a symbolized form. */
  private def syms(sym: Column): Column = split(trim(sym), " ")

  /** Adjacent symbol pairs of a symbolized form ("a b" strings). */
  def pairsOf(sym: Column): Column = {
    val s = syms(sym)
    when(size(s) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(s) - 1),
        i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
  }

  /** Apply one merge to a symbolized form (replace to fixpoint). */
  def applyMerge(sym: Column, m: Merge): Column =
    (1 to FixIters).foldLeft(sym)((c, _) => replace(c, lit(m.pat), lit(m.rep)))

  /** Apply a full merge table in rank order. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(sym)(applyMerge)

  /** Fitted tokenizer: the merge table plus the final vocabulary with
    * per-word subword counts — everything encoding needs. `vocab` is
    * (w, freq, sym, nsym); the merge table is O(k) driver state (fitted
    * parameters, the Lloyd's-centroid altitude). */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** Final vocabulary under a merge table, from scratch: identical to
    * the incrementally-built vocabulary train() maintains, because merge
    * application is sequential in rank order either way. Lets callers
    * memoize ONLY the O(k) merge table (fitted parameters) and rebuild
    * the relation with one corpus pass + a narrow map. */
  def vocabFor(corpus: DataFrame, textCol: String,
               merges: Seq[Merge]): DataFrame =
    wordFreq(corpus, textCol)
      .select(col("w"), col("freq"),
        applyMerges(symbolize(col("w")), merges).as("sym"))
      .withColumn("nsym", size(syms(col("sym"))))

  /** Train k merges. One distributed pass over the corpus, then k
    * rounds over the vocabulary relation; each round is one
    * vocabulary-bounded aggregation (pair counts) + one narrow map
    * (apply the chosen merge). The per-round argmax is a 1-row collect
    * — a fitted parameter, like a Lloyd's centroid. */
  def train(corpus: DataFrame, textCol: String, k: Int): Model = {
    var v = wordFreq(corpus, textCol)
      .select(col("w"), col("freq"), symbolize(col("w")).as("sym"))
      .localCheckpoint(true)
    val merges = (1 to k).map { rank =>
      val best = v.select(explode(pairsOf(col("sym"))).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"Bpe.train: vocabulary fully merged before rank $rank — lower k")
      val m = Merge(rank, best(0).getAs[String]("pair"), best(0).getAs[Long]("cnt"))
      // localCheckpoint per round: truncates the k-deep replace lineage
      // (the Lloyd's-iteration hygiene)
      v = v.select(col("w"), col("freq"), applyMerge(col("sym"), m).as("sym"))
        .localCheckpoint(true)
      m
    }
    Model(merges, v.withColumn("nsym", size(syms(col("sym")))))
  }

  /** Per-document subword token counts under a fitted model: explode
    * words, broadcast-join the fitted vocabulary (word → nsym), sum.
    * Out-of-vocabulary words fall back to character count + 1 (fully
    * unmerged symbolization) so encoding is total. The corpus never
    * shuffles — the only exchange is the final per-doc aggregation. */
  def encode(model: Model, docs: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(TextOps.tokens(TextOps.normalizeText(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
    words
      .join(broadcast(model.vocab.select(col("w"), col("nsym"))), Seq("w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("nsym").cast("long"),
          (length(col("w")) + lit(1)).cast("long"))).as("n_bpe_tokens"))
  }
}
