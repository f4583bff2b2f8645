package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L3 — histogram CART decision tree, from scratch, hash-exact.
  *
  * The R8 GaussianNb recipe applied to trees: on INTEGER-VALUED
  * (quantized) features, bin each dimension into `bins` fixed-width
  * buckets, then split selection per node is a fixed INTEGER-arithmetic
  * argmin a SQL oracle replays bit-for-bit:
  *
  *  - per-(node, feature, bin, class) counts come from ONE distributed
  *    groupBy per level (the classic level-wise histogram-tree pass —
  *    Spark MLlib and every histogram GBDT bin continuous features the
  *    same way; at 100 TB the per-level aggregate is the only full-data
  *    pass and its output is O(nodes·d·bins·classes), driver-tiny);
  *  - a candidate split (f, b ⇒ x_f ≤ bin b) is scored by the gini
  *    identity: minimizing weighted impurity ⟺ maximizing
  *    score = Σc_L²/n_L + Σc_R²/n_R = (Σc_L²·n_R + Σc_R²·n_L)/(n_L·n_R),
  *    whose numerator/denominator are exact integers;
  *  - a node splits only on STRICT improvement over its own impurity,
  *    tested in exact integer arithmetic (BigInt here, HUGEINT in the
  *    oracle): n·(sl·nr + sr·nl) > (Σtot²)·nl·nr — pure nodes and
  *    no-gain nodes become leaves, like sklearn's min_impurity_decrease=0;
  *  - ties rank (score DESC, feature ASC, bin ASC).
  *
  * EXACTNESS CEILING, AND THE PATH PAST IT: the comparison score is ONE
  * double division of integer-exact operands; operands stay under 2^53
  * (so the doubles are exact on any IEEE engine) while
  * n_node ≲ 3·10⁵ rows. Beyond that, fit subsamples for SPLIT SELECTION
  * only (pass `keyCol`): per fold, when the train count n exceeds
  * `sampleCap`, the per-level histogram — and therefore the split
  * choice — reads only rows whose md5("42:key#sub") prefix clears the
  * floor(cap/n·2³²) threshold (the M9/M13 hash-threshold discipline),
  * an ≈cap-row uniform subsample that is a PURE (key) predicate a SQL
  * oracle replays verbatim. Everything else — binning min/max, node
  * routing, leaf majorities, predictions — still uses FULL data, so
  * only the choice of split points is estimated (the classic
  * subsample-for-splits move of PLANET/LightGBM, where quantile
  * boundaries from a sample are statistically sufficient). The
  * realized subsample size is measured and REFUSED past the 2^53 bound
  * rather than allowed to drift.
  *
  * Ref: src/models/decision_tree.py:15-34 (DecisionTreeClassifier in the
  * reference tournament); assignment_report.md dt row (parity vs the
  * published accuracy is WineParitySpec's job — THIS form's job is exact
  * cross-engine reproducibility of fit + prediction).
  */
object HistTree {

  /** One internal node: rows with bin(feature) <= bin go left (2n+1),
    * else right (2n+2); heap numbering from root 0. */
  case class Split(node: Int, feature: Int, bin: Int,
                   nLeft: Long, nRight: Long, score: Double)

  case class TreeModel(splits: Seq[Split], leaves: Map[Int, Int],
                       mins: Array[Long], maxs: Array[Long], bins: Int) {
    /** The fitted split/grid tables as one native-descent spec — the
      * whole tree is ONE catalyst node
      * ([[graft.expressions.TreeLeafDescend]]; bit-identical to the
      * per-terminal path-CASE cascade it replaced, which made every
      * analyzer/optimizer pass traverse terminals × depth × binExpr
      * nodes). */
    private[ml] def descendSpec: graft.expressions.TreeLeafDescend.Spec =
      graft.expressions.TreeLeafDescend.Spec(
        splits.map(s => (s.node, s.feature, s.bin)).toIndexedSeq,
        mins.toIndexedSeq, maxs.toIndexedSeq, bins)
    /** Leaf id for a row (native descent; never null — every row lands
      * on exactly one terminal). */
    def leafExpr(arrCol: String): Column =
      element_at(graft.expressions.TreeLeafDescend
        .leaves(col(arrCol), Seq(descendSpec)), 1)
    /** Majority-class prediction (ties to the smallest label); null on
      * terminals no training row reached (abstain — the literal-map
      * lookup misses). */
    def predictExpr(arrCol: String): Column =
      if (leaves.isEmpty) lit(null).cast("int")
      else element_at(typedlit(leaves), leafExpr(arrCol))
  }

  /** Fixed-width bin of integer-valued feature i: floor(((x − min)·B) /
    * (max − min + 1)) — products stay exact in double, one IEEE division,
    * quotient < B by construction on FIT data (the clips matter when a
    * model scores rows outside its training range, e.g. held-out CV
    * folds: out-of-range values saturate into the edge bins). Same
    * literal formula in the oracle. */
  def binExprs(arrCol: String, mins: Array[Long], maxs: Array[Long],
               bins: Int): IndexedSeq[Column] =
    mins.indices.map { i =>
      val x = element_at(col(arrCol), i + 1).cast("double")
      greatest(least(floor(((x - lit(mins(i).toDouble)) * lit(bins.toDouble)) /
          lit((maxs(i) - mins(i) + 1).toDouble)),
        lit((bins - 1).toDouble)), lit(0.0)).cast("int")
    }

  /** The hard 2^53-exactness bound on split-selection input rows: the
    * score numerator is ≤ n_L·n_R·n ≤ n³/4, which must stay an exact
    * double. */
  private[ml] val ExactBound = 300000L

  /** Subsample predicate for split selection: md5("seed:key#sub") prefix
    * under the floor(cap/n·2³²) hex threshold — the M9 hash-threshold
    * discipline on a dedicated hash stream (the fold deal uses
    * md5("seed:key"), bootstraps md5("seed:key#<int>"); "#sub" collides
    * with neither). The same text replays in SQL with the threshold
    * computed in-query from n. */
  private[ml] def subsampleCond(keyCol: String, cap: Long, n: Long,
                                seed: Int = 42): Column = {
    val thr = f"${math.floor(cap.toDouble / n * 4294967296.0).toLong}%08x"
    substring(graft.ml.Split.hashKey(
      concat_ws("#", col(keyCol), lit("sub")), seed), 1, 8) < thr
  }

  def fit(df: DataFrame, arrCol: String, labelCol: String, d: Int,
          depth: Int = 3, bins: Int = 32, keyCol: Option[String] = None,
          sampleCap: Long = 200000): TreeModel =
    fitCv(df.withColumn("__no_fold", lit(-1)), arrCol, labelCol,
      "__no_fold", nFolds = 1, d = d, depth = depth, bins = bins,
      keyCol = keyCol, sampleCap = sampleCap).head

  /** Fit `nFolds` trees at once — tree f trains on rows whose `foldCol`
    * ≠ f (with nFolds = 1 and foldCol ≡ -1 this is the plain single
    * fit). The fold index melts into the histogram key, so K trees cost
    * the same number of per-level driver round-trips as one; bins come
    * from each fold's TRAIN min/max. Mirrors the fold-aware oracle
    * chain (R9Queries.treeCtes cv = true).
    *
    * When a fold's train count exceeds `sampleCap`, the per-level
    * HISTOGRAM (split selection) reads only the md5-thresholded
    * subsample of `keyCol` rows (see the object Scaladoc); routing and
    * leaf majorities always use full data. Passing no `keyCol` keeps
    * the refuse-don't-drift behavior at the cap. */
  def fitCv(df: DataFrame, arrCol: String, labelCol: String,
            foldCol: String, nFolds: Int, d: Int,
            depth: Int = 3, bins: Int = 32, keyCol: Option[String] = None,
            sampleCap: Long = 200000): IndexedSeq[TreeModel] = {
    require(sampleCap <= ExactBound,
      s"HistTree: sampleCap must stay within the 2^53-exact bound $ExactBound")
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
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
    val needSub = nK.exists(_ > sampleCap)
    if (needSub) require(keyCol.nonEmpty,
      "HistTree: a fold's train size exceeds sampleCap — pass keyCol to " +
        "enable md5-subsampled split selection (refusing rather than " +
        "letting score ranking drift past the 2^53-exact range)")

    val b = (0 until d).map { i =>
      (0 until nFolds).foldLeft(lit(null).cast("int")) { (acc, f) =>
        when(col("cvf") === f, binExprs(arrCol, minsK(f), maxsK(f), bins)(i))
          .otherwise(acc)
      }
    }
    val binned0 = folded.select(col("cvf"),
      col(labelCol).cast("int").as("y"), array(b: _*).as("b"))
    val binned =
      if (!needSub) binned0
      else {
        val insub = (0 until nFolds).foldLeft(lit(false)) { (acc, f) =>
          val cond =
            if (nK(f) <= sampleCap) lit(true)
            else subsampleCond(keyCol.get, sampleCap, nK(f))
          when(col("cvf") === f, cond).otherwise(acc)
        }
        val withSub = folded.select(col("cvf"),
          col(labelCol).cast("int").as("y"), array(b: _*).as("b"),
          insub.as("insub"))
        // measure the realized subsample; refuse past the exact bound
        withSub.filter(col("insub")).groupBy("cvf")
          .agg(count(lit(1)).as("ns")).collect().foreach { r =>
            require(r.getAs[Long]("ns") <= ExactBound,
              "HistTree: realized split-selection subsample exceeds the " +
                "2^53-exact bound — lower sampleCap")
          }
        withSub
      }
    def histSrc(c: DataFrame): DataFrame =
      if (needSub) c.filter(col("insub")) else c

    // `node` advances one materialized projection per level (attribute
    // reference, not expression re-inlining — linear plan growth)
    var cur = binned.withColumn("node", lit(0))
    val splits = Array.fill(nFolds)(
      scala.collection.mutable.ArrayBuffer.empty[Split])
    var lastCounts: Array[(Int, Int, Int, Int, Int, Long)] = Array.empty
    var lastBest = Map.empty[(Int, Int), Split]
    for (_ <- 0 until depth) {
      // ONE distributed pass: per-(fold, node, feature, bin, class)
      val counts = histSrc(cur)
        .select(col("cvf"), col("node"), col("y"), posexplode(col("b")))
        .groupBy(col("cvf"), col("node"), col("pos").as("f"),
          col("col").as("b"), col("y"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getAs[Int]("cvf"), r.getAs[Int]("node"),
          r.getAs[Int]("f"), r.getAs[Int]("b"), r.getAs[Int]("y"),
          r.getAs[Long]("cnt")))
      lastCounts = counts
      var lvl: Column = col("node")
      val bestAcc = Map.newBuilder[(Int, Int), Split]
      for (f <- 0 until nFolds) {
        val mine = counts.collect { case (`f`, n, ff, bb, y, c) =>
          (n, ff, bb, y, c) }
        val best = selectSplits(mine, bins)
        splits(f) ++= best
        best.foreach { s =>
          bestAcc += ((f, s.node) -> s)
          lvl = when(col("cvf") === f && col("node") === s.node,
            when(element_at(col("b"), s.feature + 1) <= s.bin,
              lit(2 * s.node + 1)).otherwise(lit(2 * s.node + 2)))
            .otherwise(lvl)
        }
      }
      lastBest = bestAcc.result()
      cur = cur.withColumn("node", lvl)
    }
    // leaf majorities (ties to the smallest label). When split selection
    // read FULL data, the final level's histogram already contains every
    // node's per-class counts — the terminal counts are its cumulative
    // sums on the chosen split, so the former final assignment pass is
    // pure rework (one less full-data pass; identical integers). The
    // subsampled route keeps the pass: there the histogram covers only
    // the subsample while leaf majorities must use full data.
    val leafCounts: Array[(Int, Int, Int, Long)] =
      // depth == 0 runs no level loop, so lastCounts is empty and the
      // derived form would return no leaves (a model that abstains on
      // every row); the groupBy pass still yields the root majority
      if (!needSub && depth > 0)
        deriveLeafCounts[Int](lastCounts,
          lastBest.map { case (k, s) => k -> (s.feature, s.bin) })
      else cur
        .groupBy("cvf", "node", "y").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getAs[Int]("cvf"), r.getAs[Int]("node"),
          r.getAs[Int]("y"), r.getAs[Long]("c")))
    (0 until nFolds).map { f =>
      val leaves = leafCounts.collect { case (`f`, n, y, c) => (n, y, c) }
        .groupBy(_._1).map { case (node, rows) =>
          node -> rows.minBy { case (_, y, c) => (-c, y) }._2
        }
      TreeModel(splits(f).toSeq, leaves, minsK(f), maxsK(f), bins)
    }
  }

  /** Terminal per-class counts derived from the LAST level's histogram:
    * for a node split at that level, the left child's class counts are
    * the cumulative sums ≤ the chosen bin on the chosen feature and the
    * right child's are the node totals minus them; an unsplit node is
    * itself terminal with its totals (any one feature's bins partition
    * the node — the smallest index present, the selectSplits
    * discipline). Exact integers, identical to the dedicated final
    * assignment pass this replaces. `cnt` may be weighted (Forest); `K`
    * is the fit key (fold, or (fold, tree)). Zero-count classes are
    * dropped, matching the groupBy form (they can never win the
    * majority anyway — some class at the node has count ≥ 1). */
  private[ml] def deriveLeafCounts[K](
      counts: Array[(K, Int, Int, Int, Int, Long)],
      best: Map[(K, Int), (Int, Int)]): Array[(K, Int, Int, Long)] =
    counts.groupBy(r => (r._1, r._2)).toArray.flatMap {
      case ((k, node), rows) =>
        val f0 = rows.map(_._3).min
        val tot = rows.filter(_._3 == f0).groupBy(_._5)
          .map { case (y, rs) => y -> rs.map(_._6).sum }
        best.get((k, node)) match {
          case Some((sf, sb)) =>
            val left = rows.filter(r => r._3 == sf && r._4 <= sb)
              .groupBy(_._5).map { case (y, rs) => y -> rs.map(_._6).sum }
            tot.keys.toSeq.flatMap { y =>
              val l = left.getOrElse(y, 0L)
              Seq((k, 2 * node + 1, y, l),
                (k, 2 * node + 2, y, tot(y) - l)).filter(_._4 > 0)
            }
          case None =>
            tot.toSeq.collect { case (y, c) if c > 0 => (k, node, y, c) }
        }
    }

  /** Driver-side argmin over the level's histogram (O(nodes·d·bins·k)
    * rows — fitted-parameter scale). Integer arithmetic exactly mirrors
    * the oracle's HUGEINT expressions. `cnt` may be a weighted count
    * (Forest's bootstrap weights — still integers, still exact);
    * `allowed(node, f)` restricts the candidate features per node
    * (Forest's mtry sampling) without affecting the node totals. */
  private[ml] def selectSplits(counts: Array[(Int, Int, Int, Int, Long)],
                               bins: Int,
                               allowed: (Int, Int) => Boolean = (_, _) => true)
      : Seq[Split] = {
    val classes = counts.map(_._4).distinct.sorted
    counts.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (node, rows) =>
      // per-node class totals (same for every feature; use the smallest
      // feature index present — feature 0 may be masked out by `allowed`
      // upstream only in scoring, never in the histogram itself)
      val f0 = rows.map(_._2).min
      val tot = classes.map(y =>
        y -> rows.collect { case (_, `f0`, _, `y`, c) => c }.sum).toMap
      val tn = BigInt(tot.values.sum)
      val st = tot.values.map(c => BigInt(c) * c).sum
      var bestKey: (Double, Int, Int) = null
      var bestSplit: Split = null
      for (f <- rows.map(_._2).distinct.sorted if allowed(node, f)) {
        val cnt = Array.fill(bins, classes.length)(0L)
        rows.foreach { case (_, ff, bb, y, c) =>
          if (ff == f) cnt(bb)(classes.indexOf(y)) += c
        }
        val cum = Array.fill(classes.length)(0L)
        for (bb <- 0 until bins) {
          classes.indices.foreach(k => cum(k) += cnt(bb)(k))
          val nl = cum.sum
          val nr = tot.values.sum - nl
          if (nl > 0 && nr > 0) {
            val sl = cum.map(c => BigInt(c) * c).sum
            val sr = classes.indices
              .map(k => { val r = tot(classes(k)) - cum(k); BigInt(r) * r }).sum
            val num = sl * nr + sr * nl
            // strict integer improvement test: n·num > Σtot²·nl·nr
            if (tn * num > st * BigInt(nl) * nr) {
              val score = num.toDouble / (BigInt(nl) * nr).toDouble
              val key = (-score, f, bb)
              if (bestKey == null || Ordering[(Double, Int, Int)]
                    .lt(key, bestKey)) {
                bestKey = key
                bestSplit = Split(node, f, bb, nl, nr, score)
              }
            }
          }
        }
      }
      Option(bestSplit)
    }
  }
}
