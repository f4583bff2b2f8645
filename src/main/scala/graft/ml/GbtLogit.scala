package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L5's LOGISTIC member, hash-exact — Newton (second-order) boosting on
  * the binary log-loss, the LightGBM `binary` objective shape, made
  * bit-replayable by a SQL oracle. The round-10 verdict left this as
  * the one approximated member ("transcendental sigmoid gradients break
  * exactness"); the round-11 move is that NO transcendental is needed:
  *
  *   - the response is the ALGEBRAIC sigmoid σ̃(x) = (1 + x/√(1+x²))/2 —
  *     same shape, same limits, σ̃(0) = 1/2, strictly monotone. Unlike
  *     exp/ln (libm, engine-dependent in the last ulp), every operation
  *     in σ̃ — multiply, add, divide, SQRT — is IEEE-754
  *     correctly-rounded in BOTH engines, so identical inputs give
  *     bit-identical doubles on Spark (Java Math) and DuckDB (libm):
  *     determinism rides on the IEEE contract, not on exactness;
  *   - margins live on a FIXED-POINT grid: fq ∈ [−2048, 2048] integer,
  *     F = fq/256 (so x = fq/256.0 is a small dyadic rational whose
  *     square is EXACT in double: fq² ≤ 2²², x² carries ≤ 44 bits, and
  *     1+x² ≤ 53 bits — the only roundings in σ̃ are the sqrt, the
  *     divide, and the final scale, all correctly rounded);
  *   - probabilities quantize to the integer grid p = ⌊256·σ̃(F)⌋, so
  *     the Newton statistics are exact integers: g = p − 256·y
  *     ∈ [−256, 256], h = max(1, ⌊p(256−p)/256⌋) ∈ [1, 64];
  *   - per level, the histogram is ONE distributed aggregate of
  *     (Σg, Σh, count) per (node, feature, bin) — the PLANET/LightGBM
  *     shape; a candidate split maximizes the Newton gain
  *     G_L²/H_L + G_R²/H_R, with the strict-improvement test
  *     (G_L²·H_R + G_R²·H_L)·H > G²·H_L·H_R run in exact integers
  *     (BigInt here, HUGEINT in the oracle) and the ranking score as a
  *     double with the IDENTICAL operation sequence on both engines
  *     (two correctly-rounded divisions and one add of exact-integer
  *     operands — deterministic without needing to be exact, which is
  *     what frees this member from HistGbtR's 2^53 refusal ceiling);
  *   - the leaf is the shrunken Newton step as a floor division,
  *     v = floorDiv(−256·G_leaf, lrDen·H_leaf), and the margin update
  *     clamps back to the grid: fq' = clamp(fq + v, ±2048).
  *
  * What is being approximated is declared, not hidden: the loss is
  * log-loss under the algebraic link (a proper, convex binary loss),
  * and probabilities carry 1/256 granularity — the price of exactness,
  * as with q_l_gbt_class's ×8 target scaling. The per-round training
  * curve reports Σg² (the quantized Brier residual — exact integer);
  * log-loss itself would need ln.
  *
  * Ref: final-assignment/src/models/lightgbm_model.py:15-112 (the
  * binary-objective boosted-tree surface being modeled).
  */
object GbtLogit {

  /** Fixed-point scale and margin clamp (F ∈ [−8, 8]). */
  val Sc = 256L
  val Clamp = 2048L

  /** One fitted split: rows with bin(feature) ≤ bin go left (2n+1). */
  case class LSplit(round: Int, node: Int, feature: Int, bin: Int,
                    nLeft: Long, nRight: Long, gLeft: Long, gRight: Long,
                    hLeft: Long, hRight: Long, score: Double)

  case class LModel(splits: Seq[LSplit], leaves: IndexedSeq[Map[Int, Long]],
                    mins: Array[Long], maxs: Array[Long], bins: Int) {
    /** Fixed-point margin fq after all rounds (clamped per round,
      * exactly as the fit updates it) — one native descent through all
      * rounds' trees ([[graft.expressions.TreeLeafDescend]]; the
      * per-round leaf-CASE cascade made every plan traversal pay
      * rounds × terminals × depth expression nodes), then a literal-map
      * lookup per round (missing leaf contributes 0, as before). */
    def marginExpr(arrCol: String): Column = {
      val specs = (1 to leaves.size).map { t =>
        graft.expressions.TreeLeafDescend.Spec(
          splits.collect { case s if s.round == t =>
            (s.node, s.feature, s.bin) }.toIndexedSeq,
          mins.toIndexedSeq, maxs.toIndexedSeq, bins)
      }
      val la = graft.expressions.TreeLeafDescend.leaves(col(arrCol), specs)
      leaves.zipWithIndex.foldLeft(lit(0L): Column) { case (acc, (lv, t)) =>
        val v = coalesce(element_at(typedlit(lv), element_at(la, t + 1)),
          lit(0L))
        greatest(least(acc + v, lit(Clamp)), lit(-Clamp))
      }
    }
    /** Class prediction: margin ≥ 0 ⇔ p ≥ 1/2. */
    def predictExpr(arrCol: String): Column =
      when(marginExpr(arrCol) >= 0, 1).otherwise(0)
  }

  /** p = ⌊256·σ̃(fq/256)⌋ as a column — the operation sequence here is
    * the SAME as the oracle's SQL text (one tree of correctly-rounded
    * IEEE ops), which is what makes the integers engine-independent. */
  private def pExpr(fq: Column): Column = {
    val x = fq.cast("double") / lit(256.0)
    floor(lit(256.0) *
      (lit(0.5) * (lit(1.0) + x / sqrt(lit(1.0) + x * x)))).cast("long")
  }

  private def gExpr(fq: Column, y: Column): Column =
    pExpr(fq) - lit(256L) * y

  private def hExpr(fq: Column): Column = {
    val p = pExpr(fq)
    greatest(lit(1L), floor((p * (lit(256L) - p)) / lit(256.0)).cast("long"))
  }

  /** Fit `rounds` depth-`depth` trees; F₀ = 0 (the rational prior —
    * ln(odds) would be transcendental). Returns the model plus the
    * per-round curve (round, Σg², nLeaves) with round 0 = the F₀
    * baseline. Guard: G_side² must stay in BIGINT for the oracle's
    * integer products — n ≤ 2³¹/256 rows (~8.4M; subsample past it,
    * the q_l_*_sub discipline). */
  def fit(df: DataFrame, arrCol: String, labelCol: String, d: Int,
          rounds: Int = 3, depth: Int = 2, bins: Int = 16,
          lrDen: Int = 2): (LModel, Seq[(Int, Long, Long)]) = {
    def el(i: Int): Column = element_at(col(arrCol), i + 1).cast("double")
    val mmAggs = (0 until d).flatMap(i =>
      Seq(min(el(i).cast("long")).as(s"mn_$i"),
        max(el(i).cast("long")).as(s"mx_$i"))) :+ count(lit(1)).as("n")
    val mmr = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val mins = Array.tabulate(d)(i => mmr.getAs[Long](s"mn_$i"))
    val maxs = Array.tabulate(d)(i => mmr.getAs[Long](s"mx_$i"))
    val n = mmr.getAs[Long]("n")
    // G_side² must stay under 2^53 so the ranking doubles are EXACT
    // (long→double and HUGEINT→double conversions are then identities on
    // both engines — no reliance on >2^53 conversion-rounding parity):
    // refuse past n·256 ≥ 2^26.5, ~370k rows (subsample first, the
    // q_l_*_sub discipline)
    require((BigInt(n) * Sc).pow(2) < (BigInt(1) << 53),
      s"GbtLogit: n=$n rows would push G² past the 2^53-exact range — " +
        "subsample the split-selection stream first")

    val b = HistTree.binExprs(arrCol, mins, maxs, bins)
    var cur = df.select(col(labelCol).cast("long").as("y"),
        array(b: _*).as("b"), lit(0L).as("fq"))
      .localCheckpoint(true)
    def gh(frame: DataFrame): DataFrame = frame
      .withColumn("g", gExpr(col("fq"), col("y")))
      .withColumn("h", hExpr(col("fq")))

    val splits = scala.collection.mutable.ArrayBuffer.empty[LSplit]
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Long]]
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    def g2Of(frame: DataFrame): Long = gh(frame)
      .agg(sum(col("g") * col("g")).as("s")).head().getAs[Long]("s")
    var prevLeaves = 1L

    for (t <- 1 to rounds) {
      var lvl = gh(cur).withColumn("node", lit(0))
      for (level <- 0 until depth) {
        // level 0 additionally carries Σg² of the margins ENTERING this
        // round (each row appears once per feature in the explode, so
        // the f = 0 slice sums every row exactly once) — the previous
        // round's curve entry rides this aggregate instead of paying a
        // dedicated pass (r13: one driver round-trip per round saved)
        val counts = lvl
          .select(col("node"), col("g"), col("h"), posexplode(col("b")))
          .groupBy(col("node"), col("pos").as("f"), col("col").as("bb"))
          .agg(sum(col("g")).as("sg"), sum(col("h")).as("sh"),
            count(lit(1)).as("c"), sum(col("g") * col("g")).as("sgg"))
          .collect()
          .map(rr => (rr.getAs[Int]("node"), rr.getAs[Int]("f"),
            rr.getAs[Int]("bb"), rr.getAs[Long]("sg"),
            rr.getAs[Long]("sh"), rr.getAs[Long]("c"),
            rr.getAs[Long]("sgg")))
        if (level == 0)
          curve += ((t - 1,
            counts.collect { case (_, 0, _, _, _, _, sgg) => sgg }.sum,
            prevLeaves))
        val best = selectSplits(t,
          counts.map { case (n, f, bb, sg, sh, c, _) =>
            (n, f, bb, sg, sh, c) }, bins)
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
      val leafStats = lvl.groupBy("node")
        .agg(sum(col("g")).as("sg"), sum(col("h")).as("sh"))
        .collect()
        .map(rr => (rr.getAs[Int]("node"), rr.getAs[Long]("sg"),
          rr.getAs[Long]("sh")))
      val lv = leafStats.map { case (node, sg, sh) =>
        node -> Math.floorDiv(-Sc * sg, lrDen * sh)
      }.toMap
      leaves += lv
      prevLeaves = leafStats.length.toLong
      val vCol = lv.foldLeft(lit(0L): Column) { case (acc, (node, v)) =>
        when(col("node") === node, lit(v)).otherwise(acc)
      }
      cur = lvl.select(col("y"), col("b"),
          greatest(least(col("fq") + vCol, lit(Clamp)), lit(-Clamp))
            .as("fq"))
      // the final round's margins feed exactly one pass (the curve tail
      // below) — re-deriving them from the last checkpoint is cheaper
      // than materializing another one
      if (t < rounds) cur = cur.localCheckpoint(true)
    }
    curve += ((rounds, g2Of(cur), prevLeaves))
    (LModel(splits.toSeq, leaves.toIndexedSeq, mins, maxs, bins),
      curve.toSeq)
  }

  /** Driver-side Newton-gain argmax over one level's histogram —
    * exact-integer improvement test (BigInt ≡ the oracle's HUGEINT),
    * double ranking score with the oracle's exact operation sequence. */
  private def selectSplits(round: Int,
                           counts: Array[(Int, Int, Int, Long, Long, Long)],
                           bins: Int): Seq[LSplit] =
    counts.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (node, rows) =>
      val f0r = rows.map(_._2).min
      val tG = rows.collect { case (_, `f0r`, _, sg, _, _) => sg }.sum
      val tH = rows.collect { case (_, `f0r`, _, _, sh, _) => sh }.sum
      val tC = rows.collect { case (_, `f0r`, _, _, _, c) => c }.sum
      var bestKey: (Double, Int, Int) = null
      var bestSplit: LSplit = null
      for (f <- rows.map(_._2).distinct.sorted) {
        val byBin = Array.fill(bins)((0L, 0L, 0L))
        rows.foreach { case (_, ff, bb, sg, sh, c) =>
          if (ff == f) byBin(bb) = (sg, sh, c)
        }
        var cg = 0L; var chh = 0L; var cc = 0L
        for (bb <- 0 until bins) {
          cg += byBin(bb)._1; chh += byBin(bb)._2; cc += byBin(bb)._3
          val (nl, nr) = (cc, tC - cc)
          if (nl > 0 && nr > 0) {
            val (gl, gr) = (cg, tG - cg)
            val (hl, hr) = (chh, tH - chh) // h ≥ 1 per row ⇒ hl, hr ≥ 1
            // strict improvement, exact: (gl²·hr + gr²·hl)·H > G²·hl·hr
            val num = BigInt(gl) * gl * hr + BigInt(gr) * gr * hl
            if (num * tH > BigInt(tG) * tG * hl * hr) {
              // ranking double: same op sequence as the oracle SQL
              val score = (gl * gl).toDouble / hl.toDouble +
                (gr * gr).toDouble / hr.toDouble
              val key = (-score, f, bb)
              if (bestKey == null ||
                  Ordering[(Double, Int, Int)].lt(key, bestKey)) {
                bestKey = key
                bestSplit = LSplit(round, node, f, bb, nl, nr,
                  gl, gr, hl, hr, score)
              }
            }
          }
        }
      }
      Option(bestSplit)
    }
}
