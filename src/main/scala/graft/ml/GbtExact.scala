package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L5's hash-exact sibling: squared-error gradient boosting on INTEGER
  * targets, from scratch, bit-replayable by a SQL oracle — the
  * GNB→CART→forest recipe applied to boosting (round-9/10 discipline).
  *
  * Why squared error first: with integer targets and INTEGER leaf
  * updates, every quantity in the fit is an exact integer —
  *
  *   - F₀ = floorDiv(Σy, n); residual r = y − F₀ (integers);
  *   - per level, the histogram is ONE distributed aggregate of
  *     (Σr, count) per (node, feature, bin) — the PLANET/LightGBM
  *     shape; only O(nodes·d·bins) rows reach the driver;
  *   - a candidate split maximizes S_L²/n_L + S_R²/n_R (the variance-
  *     gain identity); the ranking score is ONE double division of
  *     exact-integer operands (same 2^53 discipline as HistTree:
  *     ranking doubles must be exact, and fit() REFUSES when
  *     (n·max|r|)²·n could leave the exact range — measured per round,
  *     not assumed);
  *   - strict improvement is tested in exact integer arithmetic
  *     (BigInt here, HUGEINT in the oracle):
  *     n·(S_L²·n_R + S_R²·n_L) > S²·n_L·n_R;
  *   - the leaf update is the shrunken mean as a FLOOR DIVISION,
  *     v = floorDiv(S_leaf, lrDen·n_leaf) (lr = 1/lrDen) — so
  *     residuals stay integers round after round and the training
  *     curve (per-round SSE) is an exact integer too.
  *
  * Logistic-loss boosting keeps its Newton form in ml/Boost.scala
  * (transcendental gradients are deterministic per-row but their sums
  * are not oracle-replayable); this exact form is the regression-tree
  * member of the family, as the reference's GBDT experiments are. The
  * integer-quantized leaf is the price of exactness: each round's leaf
  * moves by at most 1 from the true shrunken mean, a quantization the
  * next round's residuals absorb.
  *
  * Ref: final-assignment/src/models/lightgbm_model.py:15-112,
  * teamProject/models/tree_models.py:20-97 (the boosted-tree surface
  * being modeled).
  */
object HistGbtR {

  /** One fitted split: rows with bin(feature) ≤ bin go left (2n+1). */
  case class GSplit(round: Int, node: Int, feature: Int, bin: Int,
                    nLeft: Long, nRight: Long, sLeft: Long, sRight: Long,
                    score: Double)

  case class GModel(f0: Long, splits: Seq[GSplit],
                    leaves: IndexedSeq[Map[Int, Long]],
                    mins: Array[Long], maxs: Array[Long], bins: Int) {
    /** Integer prediction Σ leaf values + F₀: ONE native descent through
      * all rounds' trees ([[graft.expressions.TreeLeafDescend]] — the
      * per-round leaf-CASE cascade it replaced re-inlined every path
      * condition per leaf per round), then a literal-map lookup per
      * round (a leaf no train row reached contributes 0 — cannot happen
      * in-sample). */
    def predictExpr(arrCol: String): Column = {
      val specs = (1 to leaves.size).map { t =>
        graft.expressions.TreeLeafDescend.Spec(
          splits.collect { case s if s.round == t =>
            (s.node, s.feature, s.bin) }.toIndexedSeq,
          mins.toIndexedSeq, maxs.toIndexedSeq, bins)
      }
      val la = graft.expressions.TreeLeafDescend.leaves(col(arrCol), specs)
      leaves.zipWithIndex.foldLeft(lit(f0): Column) { case (acc, (lv, t)) =>
        // leaves(t) is ROUND t+1's tree (GSplit.round is 1-based)
        acc + coalesce(element_at(typedlit(lv), element_at(la, t + 1)),
          lit(0L))
      }
    }
  }

  /** Fit `rounds` depth-`depth` trees. Returns the model plus the
    * per-round curve (round, sse, nLeaves) with round 0 = the F₀
    * baseline (sse = Σ(y−F₀)²).
    *
    * Past `sampleCap` rows, SPLIT SELECTION reads the md5-thresholded
    * row subsample of `keyCol` (HistTree.subsampleCond — the same
    * PLANET/LightGBM subsample-for-splits discipline the trees and
    * forests got in round 11): the per-level histogram, and therefore
    * the chosen splits, come from ≈cap rows, while binning, routing,
    * leaf values, residual updates, and the SSE curve always use FULL
    * data — so every integer in the model stays exact and the 2^53
    * ranking guard is applied to the REALIZED subsample size. Passing
    * no `keyCol` keeps refuse-don't-drift at the cap. */
  def fit(df: DataFrame, arrCol: String, labelCol: String, d: Int,
          rounds: Int = 3, depth: Int = 2, bins: Int = 16,
          lrDen: Int = 2, keyCol: Option[String] = None,
          sampleCap: Long = 200000): (GModel, Seq[(Int, Long, Long)]) = {
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    // ONE stats pass: feature min/max + label count/sum/min/max/Σy² —
    // sse0 and round-1's max|r| guard derive from these exactly
    // (sse0 = Σy² − 2·F₀·Σy + n·F₀², max|y−F₀| = max(maxY−F₀, F₀−minY)),
    // so their former dedicated jobs are gone (r13: each driver
    // round-trip cost ~0.1 s of planning+scheduling at bench scale).
    val mmAggs = (0 until d).flatMap(i =>
      Seq(min(el(i).cast("long")).as(s"mn_$i"),
        max(el(i).cast("long")).as(s"mx_$i"))) ++
      Seq(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("sy"),
        min(col(labelCol).cast("long")).as("mny"),
        max(col(labelCol).cast("long")).as("mxy"),
        sum(col(labelCol).cast("decimal(19,0)") *
          col(labelCol).cast("decimal(19,0)")).as("syy"))
    val mmr = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val mins = Array.tabulate(d)(i => mmr.getAs[Long](s"mn_$i"))
    val maxs = Array.tabulate(d)(i => mmr.getAs[Long](s"mx_$i"))
    val n = mmr.getAs[Long]("n")
    val f0 = Math.floorDiv(mmr.getAs[Long]("sy"), n)
    val needSub = keyCol.nonEmpty && n > sampleCap

    val b = HistTree.binExprs(arrCol, mins, maxs, bins)
    val baseCols = Seq(
      (col(labelCol).cast("long") - f0).as("r"), array(b: _*).as("b")) ++
      (if (needSub)
        Seq(HistTree.subsampleCond(keyCol.get, sampleCap, n).as("insub"))
      else Nil)
    var cur = df.select(baseCols: _*).localCheckpoint(true)
    // histogram row budget for the ranking guard: the REALIZED subsample
    // (measured, not assumed — the md5 threshold only approximates cap)
    val nHist = if (needSub) cur.filter(col("insub")).count() else n
    def histSrc(c: DataFrame): DataFrame =
      if (needSub) c.filter(col("insub")) else c

    val splits = scala.collection.mutable.ArrayBuffer.empty[GSplit]
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Long]]
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    // sse0 = Σ(y−F₀)² from the stats pass, exact in BigInt
    val sy = BigInt(mmr.getAs[Long]("sy"))
    val sse0 = (BigInt(mmr.getAs[java.math.BigDecimal]("syy").toBigInteger)
      - 2 * f0 * sy + BigInt(n) * f0 * f0).toLong
    curve += ((0, sse0, 1L))
    // round-1 guard bound, also from the stats pass
    var maxr = math.max(mmr.getAs[Long]("mxy") - f0,
      f0 - mmr.getAs[Long]("mny"))

    for (t <- 1 to rounds) {
      // exactness guard: ranking doubles must stay exact — the score
      // numerator is bounded by (n_hist·max|r|)²·n_hist over the rows the
      // HISTOGRAM actually reads, which must be < 2^53 (refuse, don't
      // drift). max|r| is taken over full data (⊇ the subsample), so the
      // bound is conservative for the subsampled route. Round 1's bound
      // comes from the stats pass; later rounds derive it from the
      // previous round's leaf min/max (max|r−v| = max(maxR−v, v−minR)).
      require((BigInt(nHist) * maxr).pow(2) * nHist < BigInt(1L << 53),
        s"HistGbtR: round-$t score operands exceed the 2^53-exact range " +
          s"(n_hist=$nHist, max|r|=$maxr) — shrink the target scale, or " +
          "pass keyCol to enable md5-subsampled split selection")
      var lvl = cur.withColumn("node", lit(0))
      for (_ <- 0 until depth) {
        val counts = histSrc(lvl)
          .select(col("node"), col("r"), posexplode(col("b")))
          .groupBy(col("node"), col("pos").as("f"), col("col").as("b"))
          .agg(sum(col("r")).as("s"), count(lit(1)).as("c"))
          .collect()
          .map(rr => (rr.getAs[Int]("node"), rr.getAs[Int]("f"),
            rr.getAs[Int]("b"), rr.getAs[Long]("s"), rr.getAs[Long]("c")))
        val best = selectSplits(t, counts, bins)
        splits ++= best
        var nodeCol: Column = col("node")
        best.foreach { s =>
          nodeCol = when(col("node") === s.node,
            when(element_at(col("b"), s.feature + 1) <= s.bin,
              lit(2 * s.node + 1)).otherwise(lit(2 * s.node + 2)))
            .otherwise(nodeCol)
        }
        lvl = lvl.withColumn("node", nodeCol)
      }
      // leaf stats: Σr, count, Σr², min/max r per terminal — leaf value,
      // residual update, the post-round SSE, AND the next round's
      // max|r−v| guard all come from this ONE pass
      // (sse_after = Σ_leaf (Σr² − 2vΣr + c·v²), exact integers)
      val leafStats = lvl.groupBy("node")
        .agg(sum(col("r")).as("s"), count(lit(1)).as("c"),
          sum(col("r") * col("r")).as("s2"),
          min(col("r")).as("mn"), max(col("r")).as("mx"))
        .collect()
        .map(rr => (rr.getAs[Int]("node"), rr.getAs[Long]("s"),
          rr.getAs[Long]("c"), rr.getAs[Long]("s2"),
          rr.getAs[Long]("mn"), rr.getAs[Long]("mx")))
      val lv = leafStats.map { case (node, s, c, _, _, _) =>
        node -> Math.floorDiv(s, lrDen * c)
      }.toMap
      leaves += lv
      val sse = leafStats.map { case (node, s, c, s2, _, _) =>
        val v = lv(node)
        s2 - 2 * v * s + c * v * v
      }.sum
      curve += ((t, sse, leafStats.length.toLong))
      maxr = leafStats.map { case (node, _, _, _, mn, mx) =>
        val v = lv(node)
        math.max(mx - v, v - mn)
      }.max
      // the residual update feeds the NEXT round's histogram — the last
      // round's update is dead, so skip its pass entirely
      if (t < rounds) {
        val vCol = lv.foldLeft(lit(0L): Column) { case (acc, (node, v)) =>
          when(col("node") === node, lit(v)).otherwise(acc)
        }
        cur = lvl.select(Seq((col("r") - vCol).as("r"), col("b")) ++
            (if (needSub) Seq(col("insub")) else Nil): _*)
          .localCheckpoint(true)
      }
    }
    (GModel(f0, splits.toSeq, leaves.toIndexedSeq, mins, maxs, bins),
      curve.toSeq)
  }

  /** Driver-side variance-gain argmax over one level's histogram —
    * integer arithmetic mirrors the oracle's HUGEINT expressions. */
  private def selectSplits(round: Int,
                           counts: Array[(Int, Int, Int, Long, Long)],
                           bins: Int): Seq[GSplit] =
    counts.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (node, rows) =>
      val f0r = rows.map(_._2).min
      val tS = rows.collect { case (_, `f0r`, _, s, _) => s }.sum
      val tC = rows.collect { case (_, `f0r`, _, _, c) => c }.sum
      var bestKey: (Double, Int, Int) = null
      var bestSplit: GSplit = null
      for (f <- rows.map(_._2).distinct.sorted) {
        val byBin = Array.fill(bins)((0L, 0L))
        rows.foreach { case (_, ff, bb, s, c) =>
          if (ff == f) byBin(bb) = (s, c)
        }
        var cs = 0L; var cc = 0L
        for (bb <- 0 until bins) {
          cs += byBin(bb)._1; cc += byBin(bb)._2
          val nl = cc; val nr = tC - cc
          if (nl > 0 && nr > 0) {
            val sl = BigInt(cs); val sr = BigInt(tS - cs)
            val num = sl * sl * nr + sr * sr * nl
            // strict improvement: n·num > S²·nl·nr (exact integers)
            if (BigInt(tC) * num > BigInt(tS) * tS * nl * nr) {
              val score = num.toDouble / (BigInt(nl) * nr).toDouble
              val key = (-score, f, bb)
              if (bestKey == null ||
                  Ordering[(Double, Int, Int)].lt(key, bestKey)) {
                bestKey = key
                bestSplit = GSplit(round, node, f, bb, nl, nr,
                  cs, tS - cs, score)
              }
            }
          }
        }
      }
      Option(bestSplit)
    }
}
