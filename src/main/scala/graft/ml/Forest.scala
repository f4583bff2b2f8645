package graft.ml

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.HistTree.TreeModel

/** L4 — random forest, from scratch, hash-exact: the reference's
  * HEADLINE model family (rf wins its tournament at 0.6664 accuracy)
  * re-expressed so that fit AND prediction are a fixed sequence of
  * integer operations a SQL oracle replays bit-for-bit. The R8 GNB
  * recipe, applied to bagged trees:
  *
  *  - BAGGING: each (row, tree) pair gets a deterministic bootstrap
  *    weight w ∈ {0..nTrials} — the M13 discipline (`Split.bootstrap`):
  *    nTrials md5 coin flips per pair at ratio/nTrials each, so
  *    w ~ Binomial(8, 1/8) ≈ Poisson(1), the distributed standard for
  *    sampling-with-replacement (PLANET, Spark MLlib RF do the same
  *    with non-reproducible RNGs; md5 makes it engine-portable).
  *    Weighted histogram counts stay integers, so split selection
  *    stays exact.
  *  - FEATURE SAMPLING (mtry): at each (tree, node) the candidate
  *    features are the `mtry` smallest by md5("seed:tree#node#f") —
  *    per-NODE subspace sampling, the classic Breiman RF, yet
  *    deterministic and replayable as a SQL ROW_NUMBER.
  *  - BINNING is global (one min/max pass over the full data, shared
  *    by all trees — LightGBM's RF mode does the same): bins depend
  *    only on the data, not the bootstrap, so one binned relation
  *    feeds every tree and the per-level histogram of the WHOLE
  *    forest is ONE distributed aggregate (melt the tree index into
  *    the key — same move as the fold dimension in q_l_gnb_cv).
  *  - PREDICTION: per-tree leaf majorities (weighted, ties to the
  *    smallest label), then a majority VOTE across trees (ties to the
  *    smallest label). Integers end to end.
  *  - OOB: rows with w=0 for tree t are out-of-bag for t; the OOB
  *    vote uses only those trees — the forest's self-validation,
  *    equally replayable.
  *
  * At 100 TB: the only full-data work is one min/max pass plus
  * `depth` histogram aggregates whose input is the binned relation
  * melted ×nTrees (a map-side explode, no extra shuffle keys beyond
  * (tree, node, f, b, y)); histogram output is
  * O(trees·nodes·d·bins·classes) — driver-tiny. Scoring is a codegen
  * CASE cascade, no joins.
  *
  * Ref: cross-validation/wine_analysis.py:245-343 (tournament, rf
  * entry), src/models/random_forest.py (n_estimators/max_depth
  * surface); exactness ceiling inherited from HistTree (see there).
  */
object Forest {

  case class ForestModel(trees: IndexedSeq[TreeModel], voteClasses: Seq[Int],
                         nTrials: Int, seed: Int,
                         /** per tree: node -> (Σ_y c², Σ_y c) weighted class
                           * moments at that node, captured from the fit's
                           * level histograms — the impurity-importance
                           * inputs (empty for models built before r9). */
                         nodeStats: IndexedSeq[Map[Int, (Long, Long)]] =
                           IndexedSeq.empty) {
    /** Per-tree predictions (codegen CASE cascades). */
    def treePredictExprs(arrCol: String): IndexedSeq[Column] =
      trees.map(_.predictExpr(arrCol))
    /** Majority vote over an array of per-tree predictions; ties go to
      * the smallest label (array_position returns the FIRST index of
      * the max, and voteClasses is sorted ascending). A tree whose leaf
      * map doesn't cover a row's node abstains (null in the array, and
      * null === c is null, so filter drops it); a row on which EVERY
      * tree abstains gets a null prediction — the same rows the
      * oracle's leaf join drops. */
    def voteExpr(predsArr: Column): Column = {
      val votes = voteClasses.map(c => size(filter(predsArr, _ === lit(c))))
      val vArr = array(votes.map(_.cast("int")): _*)
      when(array_max(vArr) === 0, lit(null).cast("int")).otherwise(
        element_at(array(voteClasses.map(lit): _*),
          array_position(vArr, array_max(vArr)).cast("int")))
    }
    def predictExpr(arrCol: String): Column =
      voteExpr(array(treePredictExprs(arrCol): _*))
    /** Production scoring path: materialize the per-tree prediction
      * array as one projection, then vote over the (cheap) attribute
      * reference — each tree's CASE cascade appears exactly ONCE in the
      * plan, where inlining it into every class's vote count would
      * multiply plan size by classes × vote-uses. */
    def predict(df: DataFrame, arrCol: String, outCol: String): DataFrame =
      df.withColumn("_forest_preds", array(treePredictExprs(arrCol): _*))
        .withColumn(outCol, voteExpr(col("_forest_preds")))
        .drop("_forest_preds")
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** The mtry feature subset for (tree, node): rank features by
    * md5("seed:tree#node#f") (ties by f), keep the smallest `mtry` —
    * the driver-side twin of the oracle's ROW_NUMBER OVER (PARTITION BY
    * tf, node ORDER BY MD5(...), f) <= mtry. */
  def allowedFeatures(seed: Int, tree: Int, node: Int, d: Int,
                      mtry: Int): Set[Int] =
    (0 until d).sortBy(f => (md5hex(s"$seed:$tree#$node#$f"), f))
      .take(mtry).toSet

  /** Bootstrap weight of (key, tree) as a Column: nTrials md5 coin
    * flips at ratio 1/nTrials — trial ids are tree*nTrials+dd so trees
    * draw disjoint hash streams. Mirrors Split.bootstrap / q_m13.
    * Public: OOB evaluation re-derives w to find each tree's held-out
    * rows (w = 0). */
  def weightExpr(keyCol: String, treeCol: Column, seed: Int,
                 nTrials: Int): Column = {
    val threshold = f"${math.floor(1.0 / nTrials * 4294967296.0).toLong}%08x"
    Seq.tabulate(nTrials) { dd =>
      val trial = (treeCol * nTrials + lit(dd)).cast("int").cast("string")
      when(substring(Split.hashKey(concat_ws("#", col(keyCol), trial), seed),
        1, 8) < threshold, 1).otherwise(0)
    }.reduce(_ + _)
  }

  def fit(df: DataFrame, keyCol: String, arrCol: String, labelCol: String,
          d: Int, nTrees: Int = 4, depth: Int = 3, bins: Int = 32,
          mtry: Int = 2, seed: Int = 42, nTrials: Int = 8,
          sampleCap: Long = 200000): ForestModel =
    fitCv(df.withColumn("__no_fold", lit(-1)), keyCol, arrCol, labelCol,
      "__no_fold", nFolds = 1, d = d, nTrees = nTrees, depth = depth,
      bins = bins, mtry = mtry, seed = seed, nTrials = nTrials,
      sampleCap = sampleCap).head

  /** Fit `nFolds` forests at once — forest f trains on rows whose
    * `foldCol` ≠ f (K-fold CV; with nFolds = 1 and foldCol ≡ -1 this is
    * the plain single fit). The fold index MELTS into the histogram key
    * exactly like the tree index: one distributed aggregate per LEVEL
    * covers every (fold, tree, node) — K·T trees cost the same number of
    * driver round-trips as one (the fold dimension multiplies rows
    * inside a map-side explode, never the number of passes). Bins come
    * from each fold's TRAIN min/max (one grouped pass); bootstrap
    * weights and mtry masks are fold-independent by construction, so
    * they're computed once. Mirrors the oracle's forestCtes(cv = true)
    * stage for stage. */
  def fitCv(df: DataFrame, keyCol: String, arrCol: String, labelCol: String,
            foldCol: String, nFolds: Int, d: Int, nTrees: Int = 4,
            depth: Int = 3, bins: Int = 32, mtry: Int = 2, seed: Int = 42,
            nTrials: Int = 8, sampleCap: Long = 200000)
      : IndexedSeq[ForestModel] = {
    require(sampleCap <= HistTree.ExactBound,
      s"Forest: sampleCap must stay within the 2^53-exact bound " +
        s"${HistTree.ExactBound}")
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    // per-fold TRAIN min/max + row count in ONE grouped pass
    val folded = df
      .withColumn("cvf", explode(array((0 until nFolds).map(lit): _*)))
      .filter(col(foldCol) =!= col("cvf"))
    val mmAggs = (0 until d).flatMap(i =>
      Seq(min(el(i).cast("long")).as(s"mn_$i"),
        max(el(i).cast("long")).as(s"mx_$i"))) :+ count(lit(1)).as("n")
    val mm = folded.groupBy("cvf").agg(mmAggs.head, mmAggs.tail: _*)
      .collect().map(r => r.getAs[Int]("cvf") -> r).toMap
    val minsK = Array.tabulate(nFolds, d)((f, i) => mm(f).getAs[Long](s"mn_$i"))
    val maxsK = Array.tabulate(nFolds, d)((f, i) => mm(f).getAs[Long](s"mx_$i"))
    val nK = (0 until nFolds).map(f => mm(f).getAs[Long]("n"))
    // weighted rows per tree sum to ~n (E[w] = 1), so HistTree's score
    // ceiling applies per tree as-is; past sampleCap the per-level
    // histogram reads the md5-thresholded ROW subsample (the same rows
    // for every tree — split selection only; routing and leaf
    // majorities keep full data). See HistTree's object Scaladoc.
    val needSub = nK.exists(_ > sampleCap)

    // per-fold bin expressions, dispatched on the materialized cvf column
    val b = (0 until d).map { i =>
      (0 until nFolds).foldLeft(lit(null).cast("int")) { (acc, f) =>
        when(col("cvf") === f,
          HistTree.binExprs(arrCol, minsK(f), maxsK(f), bins)(i))
          .otherwise(acc)
      }
    }
    // melt the tree index in (map-side explode), weight each pair, drop
    // w=0 — ONE relation feeds every level's histogram for ALL folds and
    // ALL trees
    val baseCols = Seq(col(keyCol), col("cvf"),
      col(labelCol).cast("int").as("y"), array(b: _*).as("b")) ++
      (if (!needSub) Nil
       else Seq((0 until nFolds).foldLeft(lit(false)) { (acc, f) =>
         val cond =
           if (nK(f) <= sampleCap) lit(true)
           else HistTree.subsampleCond(keyCol, sampleCap, nK(f))
         when(col("cvf") === f, cond).otherwise(acc)
       }.as("insub")))
    val melted = folded.select(baseCols: _*)
      .withColumn("tree", explode(array((0 until nTrees).map(lit): _*)))
      .withColumn("w",
        weightExpr(keyCol, col("tree"), seed, nTrials).cast("long"))
      .filter(col("w") > 0)
      .localCheckpoint(true) // depth+1 aggregates read it; hashes are cheap
                             // but re-planning the explode each pass isn't
    if (needSub)
      // realized subsample guard: per (fold, tree) the weighted
      // histogram total is Σw over the subsample — measure and refuse
      // past the exact bound instead of drifting
      melted.filter(col("insub")).groupBy("cvf", "tree")
        .agg(sum(col("w")).as("ws")).collect().foreach { r =>
          require(r.getAs[Long]("ws") <= HistTree.ExactBound,
            "Forest: realized split-selection subsample weight exceeds " +
              "the 2^53-exact bound — lower sampleCap")
        }
    def histSrc(c: DataFrame): DataFrame =
      if (needSub) c.filter(col("insub")) else c

    // `node` is a MATERIALIZED column advanced one projection per level
    // (each level's reassignment references the previous level's node
    // ATTRIBUTE, not its expression — plan size stays linear in total
    // splits where re-inlining the cascade would grow exponentially
    // with depth × trees)
    var cur = melted.withColumn("node", lit(0))
    val splits = Array.fill(nFolds, nTrees)(
      scala.collection.mutable.ArrayBuffer.empty[HistTree.Split])
    val stats = Array.fill(nFolds, nTrees)(
      scala.collection.mutable.Map.empty[Int, (Long, Long)])
    var lastCounts: Array[((Int, Int), Int, Int, Int, Int, Long)] =
      Array.empty
    var lastBest = Map.empty[((Int, Int), Int), HistTree.Split]
    for (_ <- 0 until depth) {
      // ONE distributed pass per level for every (fold, tree)
      val counts = histSrc(cur)
        .select(col("cvf"), col("tree"), col("node"), col("y"), col("w"),
          posexplode(col("b")))
        .groupBy(col("cvf"), col("tree"), col("node"), col("pos").as("f"),
          col("col").as("b"), col("y"))
        .agg(sum(col("w")).as("cnt"))
        .collect()
        .map(r => (r.getAs[Int]("cvf"), r.getAs[Int]("tree"),
          r.getAs[Int]("node"), r.getAs[Int]("f"), r.getAs[Int]("b"),
          r.getAs[Int]("y"), r.getAs[Long]("cnt")))
      lastCounts = counts.map { case (cvf, t, n, ff, bb, y, c) =>
        ((cvf, t), n, ff, bb, y, c) }
      var lvl: Column = col("node")
      val bestAcc = Map.newBuilder[((Int, Int), Int), HistTree.Split]
      for (f <- 0 until nFolds; t <- 0 until nTrees) {
        val mine = counts.collect {
          case (`f`, `t`, n, ff, bb, y, c) => (n, ff, bb, y, c) }
        // per-node weighted class moments (Σc², Σc) for impurity
        // importance — feature 0's bins partition each node's rows, so
        // its per-class bin sums ARE the node's class counts (the
        // oracle's fnt CTE computes the same from fa$l directly)
        mine.filter(_._2 == 0).groupBy(_._1).foreach { case (node, rows) =>
          val byY = rows.groupBy(_._4).map { case (_, rs) => rs.map(_._5).sum }
          stats(f)(t)(node) = (byY.map(c => c * c).sum, byY.sum)
        }
        val best = HistTree.selectSplits(mine, bins,
          (node, feat) => allowedFeatures(seed, t, node, d, mtry)(feat))
        splits(f)(t) ++= best
        best.foreach { s =>
          bestAcc += (((f, t), s.node) -> s)
          lvl = when(col("cvf") === f && col("tree") === t &&
              col("node") === s.node,
            when(element_at(col("b"), s.feature + 1) <= s.bin,
              lit(2 * s.node + 1)).otherwise(lit(2 * s.node + 2)))
            .otherwise(lvl)
        }
      }
      lastBest = bestAcc.result()
      cur = cur.withColumn("node", lvl)
    }
    // weighted leaf majorities per (fold, tree, node), ties to smallest
    // label. Full-data split selection: the terminal counts are exact
    // cumulative sums of the LAST level's histogram on each node's
    // chosen split (HistTree.deriveLeafCounts) — the dedicated final
    // assignment pass over `melted` is rework, and it was the fit's
    // single biggest pass (the d-wide explode rides every level's
    // histogram anyway). Subsampled route keeps the pass: its histogram
    // covers only the subsample, leaf majorities must use full weights.
    val leafCounts: Array[(Int, Int, Int, Int, Long)] =
      // depth == 0: no level histograms to derive from — groupBy fallback
      if (!needSub && depth > 0)
        HistTree.deriveLeafCounts[(Int, Int)](lastCounts,
          lastBest.map { case (k, s) => k -> (s.feature, s.bin) })
          .map { case ((cvf, t), node, y, c) => (cvf, t, node, y, c) }
      else cur
        .groupBy("cvf", "tree", "node", "y").agg(sum(col("w")).as("c"))
        .collect()
        .map(r => (r.getAs[Int]("cvf"), r.getAs[Int]("tree"),
          r.getAs[Int]("node"), r.getAs[Int]("y"), r.getAs[Long]("c")))
    (0 until nFolds).map { f =>
      val trees = (0 until nTrees).map { t =>
        val leaves = leafCounts.collect { case (`f`, `t`, n, y, c) => (n, y, c) }
          .groupBy(_._1).map { case (node, rows) =>
            node -> rows.minBy { case (_, y, c) => (-c, y) }._2
          }
        TreeModel(splits(f)(t).toSeq, leaves, minsK(f), maxsK(f), bins)
      }
      val voteClasses = trees.flatMap(_.leaves.values).distinct.sorted
      ForestModel(trees, voteClasses, nTrials, seed,
        (0 until nTrees).map(t => stats(f)(t).toMap))
    }
  }

  /** Per-split weighted impurity decrease — sklearn's impurity-based
    * `feature_importances_` numerator, in the exact-arithmetic form:
    * for a split of node v,
    *   n_v·gini(v) − n_L·gini(L) − n_R·gini(R)
    *     = (Σ_L c²/n_L + Σ_R c²/n_R) − Σ_v c²/n_v
    *     = score(v) − st_v/n_v
    * i.e. the stored split score (one exact double division) minus one
    * more exact division of the fitted class moments — so the DuckDB
    * oracle reproduces every decrease bit-for-bit from the same
    * histogram CTEs. Returns one (tree, node, feature, decrease) row
    * per split; callers DECIMAL-sum by feature (order-independent). */
  def importanceRows(m: ForestModel): Seq[(Int, Int, Int, Double)] =
    m.trees.zipWithIndex.flatMap { case (t, ti) =>
      t.splits.map { sp =>
        val (st, tn) = m.nodeStats(ti)(sp.node)
        (ti, sp.node, sp.feature,
          sp.score - st.toDouble / tn.toDouble)
      }
    }
}
