package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Num._

/** Rank machinery shared by the rank-based tests (Spearman, Wilcoxon,
  * Mann-Whitney, Kruskal-Wallis — SURVEY.md §2.10 T8, T11-T13).
  *
  * Scale design: ranks are computed on the per-DISTINCT-VALUE relation
  * (groupBy value → counts), and the cumulative count that turns counts
  * into midranks is a DISTRIBUTED prefix sum (ops.Prefix) — range-
  * partition the distinct values, per-partition cumulative windows in
  * parallel, bucket offsets from a broadcast self-join over the
  * ~numPartitions totals. No single-partition global window anywhere: a
  * high-cardinality column (every value distinct) ranks at full
  * parallelism. Midranks (average ranks for ties) come out exactly right
  * by construction — integer arithmetic, independent of the bucketing.
  */
object Ranks {

  /** Per distinct value of `v`: `cnt` and 1-based midrank `avg_rank`,
    * plus caller-supplied extra aggregates (e.g. positives per value).
    *
    * The cumulative count that turns per-value counts into midranks is a
    * distributed prefix sum ([[graft.ops.Prefix.runningSums]]): range-
    * partitioned parallel windows plus broadcast bucket offsets — there is
    * no single-partition path anymore, because a high-cardinality column
    * (every value distinct) must rank at full parallelism, and a default
    * anyone can forget to flip is exactly how a 6×10⁵-distinct rank ends
    * up sorting in one task (round-3 lesson: q_t8_spearman). Midranks
    * (average ranks for ties) are exact integer arithmetic, independent of
    * the bucketing; StatsSpec pins single-window parity. */
  def byValue(df: DataFrame, v: String, extraAggs: Seq[Column] = Nil): DataFrame = {
    val counts = df.filter(col(v).isNotNull)
      .groupBy(col(v))
      .agg(count(lit(1)).as("cnt"), extraAggs: _*)
    graft.ops.Prefix.runningSums(counts, Seq(col(v)), Seq(col("cnt") -> "__cum"))
      .withColumn("avg_rank",
        (col("__cum") - col("cnt")).cast("double") + (col("cnt") + lit(1)) / 2.0)
      .drop("__cum")
  }

  /** Tie-correction term Σ(τ³−τ) over tie groups of `v`. */
  def tieTerm(rankedByValue: DataFrame): Column = {
    // cnt³ through DECIMAL (HUGEINT in the oracle): a 2M-row tie group
    // would overflow a long product, and the long SUM overflows even
    // sooner — found by the sf10 gate (round 11). Values are unchanged
    // wherever the long form didn't overflow.
    val c = col("cnt").cast(org.apache.spark.sql.types.DecimalType(12, 0))
    sum((c * c * c - col("cnt"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .cast("double")
  }
}

/** Classification metrics (SURVEY.md §2.10 T1-T7). All are single
  * aggregation passes; nothing collects row data to the driver.
  * Ref: final-assignment/src/utils/metrics.py:11-22,
  * teamProject/utils/evaluation.py:10-51. */
object Metrics {

  /** T6 — confusion matrix as a (label, pred, n) relation.
    * Ref: teamProject/utils/evaluation.py:90-92. */
  def confusionMatrix(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol), col(predCol)).agg(count(lit(1)).as("n"))
      .orderBy(col(labelCol), col(predCol))

  /** Binary confusion counts in ONE pass (labels/preds in {0,1}). */
  def binaryCounts(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val l = col(labelCol); val p = col(predCol)
    df.agg(
      sum(when(l === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(l === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(l === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(l === 0 && p === 0, 1L).otherwise(0L)).as("tn"))
  }

  /** T1/T4 — precision / recall / F1 / accuracy from one counting pass.
    * Ref: final-assignment/src/utils/metrics.py:11-17. */
  def binaryMetrics(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val c = binaryCounts(df, labelCol, predCol)
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tn = col("tn").cast("double")
    c.select(
      col("tp"), col("fp"), col("fn"), col("tn"),
      (tp / (tp + fp)).as("precision"),
      (tp / (tp + fn)).as("recall"),
      (lit(2.0) * tp / (lit(2.0) * tp + fp + fn)).as("f1"),
      ((tp + tn) / (tp + fp + fn + tn)).as("accuracy"))
  }

  /** T2 — per-class F1 + macro-F1 over the union of observed classes
    * (sklearn `f1_score(average='macro')` semantics: a class with no
    * predictions and no labels does not appear; zero-division → 0).
    * Ref: teamProject/utils/evaluation.py:10-51. */
  def perClassF1(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = df.groupBy(col(labelCol).as("l"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val classes = cm.select(col("l").as("cls")).union(cm.select(col("p").as("cls"))).distinct()
    val tp = cm.filter(col("l") === col("p")).select(col("l").as("cls"), col("n").as("tp"))
    val labelTot = cm.groupBy(col("l").as("cls")).agg(sum("n").as("n_label"))
    val predTot = cm.groupBy(col("p").as("cls")).agg(sum("n").as("n_pred"))
    classes
      .join(tp, Seq("cls"), "left").join(labelTot, Seq("cls"), "left")
      .join(predTot, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "n_label", "n_pred"))
      .select(
        col("cls"),
        col("tp"), col("n_label"), col("n_pred"),
        when(col("n_label") + col("n_pred") === 0, 0.0)
          .otherwise(lit(2.0) * col("tp") / (col("n_label") + col("n_pred"))).as("f1"))
      .orderBy("cls")
  }

  def macroF1(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    // davg (decimal-exact) so the tiny cross-class sum is order-independent
    perClassF1(df, labelCol, predCol).agg(davg(col("f1")).as("macro_f1"))

  /** T3 — exact AUROC by the Mann-Whitney rank statistic, computed on the
    * per-distinct-score relation (midranks handle ties exactly; no global
    * row sort). AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊·n₋).
    * Ref: final-assignment/src/utils/metrics.py:16. */
  def auroc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val ranked = Ranks.byValue(
      df.select(col(scoreCol), col(labelCol).cast("long").as("__lbl")),
      scoreCol,
      Seq(sum(col("__lbl")).as("pos")))
    ranked.agg(
      dsum(col("pos") * col("avg_rank")).as("sum_pos_rank"),
      sum(col("pos")).cast("double").as("n_pos"),
      sum(col("cnt") - col("pos")).cast("double").as("n_neg")
    ).select(
      ((col("sum_pos_rank") - col("n_pos") * (col("n_pos") + 1) / 2.0)
        / (col("n_pos") * col("n_neg"))).as("auroc"))
  }

  /** T5 — the reference's combined score (F1 + AUROC) / 2.
    * Ref: final-assignment/src/utils/metrics.py:20-22. */
  def combinedScore(df: DataFrame, labelCol: String, scoreCol: String,
                    threshold: Double = 0.5): DataFrame = {
    val withPred = df.withColumn("__pred",
      when(col(scoreCol) >= threshold, 1).otherwise(0))
    val f1 = binaryMetrics(withPred, labelCol, "__pred").select("f1")
    val auc = auroc(df, labelCol, scoreCol)
    f1.crossJoin(auc).select(
      col("f1"), col("auroc"), ((col("f1") + col("auroc")) / 2.0).as("score"))
  }
}

/** Statistical hypothesis tests (SURVEY.md §2.10 T8-T14). Each returns the
  * test statistic(s) as a 1-row DataFrame from pure aggregation; p-values
  * (which need distribution CDFs) are provided by [[PValues]] on the
  * collected scalars — the only driver-side step, O(1) data. */
object Tests {

  /** T9 — Welch two-sample t-test of `valueCol` between groups g1, g2 of
    * `groupCol`. Returns means, t statistic and Welch-Satterthwaite df.
    * Ref: final-assignment/experiments/train_test_comparison.py:94. */
  def welchT(df: DataFrame, valueCol: String, groupCol: String,
             g1: String, g2: String): DataFrame = {
    val v = col(valueCol)
    def side(g: String, suffix: String) =
      df.filter(col(groupCol) === g && v.isNotNull).agg(
        count(v).cast("double").as("n" + suffix),
        davg(v).as("mean" + suffix),
        dvarSamp(v).as("var" + suffix))
    side(g1, "1").crossJoin(side(g2, "2")).select(
      col("n1"), col("mean1"), col("n2"), col("mean2"),
      ((col("mean1") - col("mean2")) /
        sqrt(col("var1") / col("n1") + col("var2") / col("n2"))).as("t"),
      (((col("var1") / col("n1") + col("var2") / col("n2")) *
        (col("var1") / col("n1") + col("var2") / col("n2"))) /
        ((col("var1") / col("n1")) * (col("var1") / col("n1")) / (col("n1") - 1) +
         (col("var2") / col("n2")) * (col("var2") / col("n2")) / (col("n2") - 1))).as("df"))
  }

  /** T9 — paired t-test on a per-row difference column. */
  def pairedT(df: DataFrame, diffCol: String): DataFrame = {
    val d = col(diffCol)
    df.filter(d.isNotNull).agg(
      count(d).cast("double").as("n"), davg(d).as("mean_diff"),
      dvarSamp(d).as("var_diff")
    ).select(
      col("n"), col("mean_diff"),
      (col("mean_diff") / sqrt(col("var_diff") / col("n"))).as("t"),
      (col("n") - 1).as("df"))
  }

  /** T10 — chi-squared test of independence on the a×b contingency table.
    * One counting pass; margins by broadcast-joinable small relations.
    * Ref: final-assignment/experiments/train_test_comparison.py:53-56. */
  def chi2(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val rowT = obs.groupBy("a").agg(sum("n").as("row_n"))
    val colT = obs.groupBy("b").agg(sum("n").as("col_n"))
    val total = obs.agg(sum("n").as("tot_n"))
    // The full a×b grid (zeros included): expected counts exist for empty cells.
    val grid = rowT.crossJoin(colT).crossJoin(total)
      .join(obs, Seq("a", "b"), "left").na.fill(0L, Seq("n"))
    val expected = col("row_n") * col("col_n") / col("tot_n").cast("double")
    grid.agg(
      dsum((col("n") - expected) * (col("n") - expected) / expected).as("chi2"),
      ((countDistinct("a") - 1) * (countDistinct("b") - 1)).cast("long").as("dof"))
  }

  /** T8 — Spearman rank correlation: Pearson over midranks. Ranks come from
    * the distinct-value relation of each variable, joined back — no
    * single-partition row sort.
    *
    * Numerics: DOUBLED midranks are exact integers (ties midrank on .5),
    * so every moment is an exact integer sum, accumulated through
    * decimal(38,0) (≡ int128 on the oracle side) — no fractional decimal
    * ever reaches a double conversion, which removes the 1-ulp drift the
    * previous decimal(30,6) path showed beyond 10⁶ rows. Only the final
    * O(1) moments convert to double: BigInteger.doubleValue here, and a
    * decimal-string parse on the oracle side (DuckDB 1.0's direct
    * hugeint→double cast is NOT correctly rounded — measured — while its
    * string parse is). Exact to ≈2.5·10⁹ rows (4n⁴ < 2¹²⁷); rho is
    * invariant under the common ×2 rank scaling. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val d2 = (col("avg_rank") * 2).cast("long")
    val rx = Ranks.byValue(base, xCol).select(col(xCol), d2.as("dx"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // The y-side ranking FUSES into the joint aggregation (guide §2.4 —
    // two operations keyed the same way share one exchange): instead of
    // ranking y's distinct values separately and joining the full base
    // back on the high-cardinality y (the former plan's dominant
    // exchange), group the dx-tagged base by y ONCE, carrying the
    // per-y partial x-moments (Σdx, Σdx² — exact decimal integers), rank
    // THAT relation's cumulative counts, and read every moment off the
    // per-distinct-y relation: Σ_rows dy^k·dx^j = Σ_y dy^k·(Σ_y dx^j).
    // One groupBy + one prefix sum + one O(distinct-y) aggregate replace
    // groupBy + prefix + two full-base joins; the moments are the same
    // exact integers (regrouped decimal sums), so rho is bit-identical.
    val perY = base.join(rx, Seq(xCol))
      .groupBy(col(yCol))
      .agg(count(lit(1)).as("cnt"),
        // cast BEFORE multiplying: doubled ranks reach 2n, so long×long
        // products hit 4n² and would silently overflow int64 at n ≳ 1.5e9 —
        // below the documented ≈2.5e9 exactness bound of the moment formula
        sum(col("dx").cast(dec)).as("sdx"),
        sum(col("dx").cast(dec) * col("dx").cast(dec)).as("sdx2"))
    // dy = 2·midrank(y) = 2·cum − cnt + 1 — exact integer arithmetic,
    // the same value byValue's avg_rank doubling produces
    val ranked = graft.ops.Prefix
      .runningSums(perY, Seq(col(yCol)), Seq(col("cnt") -> "__cum"))
      .withColumn("dy", (col("__cum") * 2 - col("cnt") + 1).cast(dec))
    val s = ranked
      .agg(sum(col("cnt")).as("n"),
        sum(col("sdx")).as("sx"),
        sum(col("cnt").cast(dec) * col("dy")).as("sy"),
        sum(col("sdx2")).as("sxx"),
        sum(col("cnt").cast(dec) * col("dy") * col("dy")).as("syy"),
        sum(col("sdx") * col("dy")).as("sxy"))
      .head()
    val n = BigInt(s.getLong(0))
    def m(i: Int): BigInt = BigInt(s.getDecimal(i).toBigInteger)
    val num = n * m(5) - m(1) * m(2)
    val denx = n * m(3) - m(1) * m(1)
    val deny = n * m(4) - m(2) * m(2)
    val rho = num.doubleValue /
      (math.sqrt(denx.doubleValue) * math.sqrt(deny.doubleValue))
    Seq(rho).toDF("rho")
  }

  /** T12 — Mann-Whitney U of `valueCol` between g1 and g2 (two-sided z with
    * tie correction). U₁ = R₁ − n₁(n₁+1)/2 over pooled midranks.
    * Ref: iris Statistical_test_iris_analysis.ipynb cell 1. */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
                   g1: String, g2: String): DataFrame = {
    val pool = df.filter(col(groupCol).isin(g1, g2) && col(valueCol).isNotNull)
      .select(col(valueCol), when(col(groupCol) === g1, 1L).otherwise(0L).as("__g1"))
    val ranked = Ranks.byValue(pool, valueCol, Seq(sum("__g1").as("n_g1_at")))
    ranked.agg(
      dsum(col("n_g1_at") * col("avg_rank")).as("r1"),
      sum("n_g1_at").cast("double").as("n1"),
      sum(col("cnt") - col("n_g1_at")).cast("double").as("n2"),
      Ranks.tieTerm(ranked).as("tie")
    ).select(
      (col("r1") - col("n1") * (col("n1") + 1) / 2.0).as("u1"),
      col("n1"), col("n2"),
      // z with tie-corrected variance (normal approximation)
      ((col("r1") - col("n1") * (col("n1") + 1) / 2.0) - col("n1") * col("n2") / 2.0)
        .as("u_centered"),
      sqrt(col("n1") * col("n2") / 12.0 *
        ((col("n1") + col("n2") + 1) -
          col("tie") / ((col("n1") + col("n2")) * (col("n1") + col("n2") - 1))))
        .as("sigma"))
      .withColumn("z", col("u_centered") / col("sigma"))
      .select(col("u1"), col("n1"), col("n2"), col("z"))
  }

  /** T11 — Wilcoxon signed-rank on a difference column: W⁺, W⁻, n (nonzero
    * pairs), z (normal approximation with tie correction; zeros dropped,
    * scipy `wilcoxon(..., zero_method='wilcox')` convention).
    * Ref: cross-validation/wine_analysis.py:151. */
  def wilcoxonSignedRank(df: DataFrame, diffCol: String): DataFrame = {
    val d = col(diffCol)
    val nz = df.filter(d.isNotNull && d =!= 0)
      .select(abs(d).as("absd"), when(d > 0, 1L).otherwise(0L).as("pos"))
    val ranked = Ranks.byValue(nz, "absd", Seq(sum("pos").as("n_pos_at")))
    ranked.agg(
      dsum(col("n_pos_at") * col("avg_rank")).as("w_plus"),
      sum(col("cnt")).cast("double").as("n"),
      dsum((col("cnt") - col("n_pos_at")) * col("avg_rank")).as("w_minus"),
      Ranks.tieTerm(ranked).as("tie")
    ).select(
      col("w_plus"), col("w_minus"), col("n"),
      ((col("w_plus") - col("n") * (col("n") + 1) / 4.0) /
        sqrt(col("n") * (col("n") + 1) * (col("n") * 2 + 1) / 24.0
          - col("tie") / 48.0)).as("z"))
  }

  /** T11 exact — the small-sample Wilcoxon signed-rank tail, where the
    * normal approximation is at its worst: zero diffs dropped, |d|
    * MIDRANKED (doubled to stay integer — r2 = 2·midrank), and the
    * p-values are exact fractions of the 2^m sign assignments whose
    * positive-rank sum reaches W⁺ (resp. falls to W⁻). This is scipy's
    * `wilcoxon(mode='exact')` made total: scipy REFUSES ties in exact
    * mode; the midrank permutation tail is the same test with midranks
    * substituted, and it degenerates to the classical exact table when
    * there are no ties (StatsSpec pins published values). The
    * distribution is built by the classical generating-function
    * shift-DP Π(1 + x^{r2_i}) — count-of-rank-sums, O(m · Σr2) integer
    * driver work on the collected (r2, count) pairs (fitted-statistic
    * scale; the heavy part, ranking, is the distributed Ranks pass).
    * Counts stay in LONGS while they fit (Σ coeff = 2^m ≤ 2⁶² for
    * m ≤ 62 — covers the reference's n = 40 shuffle-split comparisons
    * in microseconds) and switch to BigInt beyond, exact to the n ≈ 500
    * guard (~10⁸ BigInt adds — seconds, and far past any sample size
    * where the normal approximation is still distinguishable from
    * exact). The same tail runs distributed inside q_l_tournament_sig's
    * oracle (explicit 2^m mask explosion — affordable at m ≤ 5).
    * StatsSpec pins the published n = 40 critical values (two-sided
    * T₀.₀₅ = 264, T₀.₀₁ = 220).
    * Output: (w_plus, w_minus, n, p_greater, p_less, p_two_sided). */
  def wilcoxonSignedRankExact(df: DataFrame, diffCol: String,
                              maxN: Int = 500): DataFrame = {
    val d = col(diffCol)
    val nz = df.filter(d.isNotNull && d =!= 0)
      .select(abs(d).as("absd"), when(d > 0, 1L).otherwise(0L).as("pos"))
    val ranked = Ranks.byValue(nz, "absd", Seq(sum("pos").as("n_pos_at")))
      // r2 = 2·midrank — avg_rank is integer-or-half-integer, so the
      // doubled value is an exact integer-valued double
      .select((col("avg_rank") * 2).cast("long").as("r2"),
        col("cnt").cast("long").as("cnt"),
        col("n_pos_at").cast("long").as("npos"))
    val rows = ranked.collect()
      .map(r => (r.getAs[Long]("r2"), r.getAs[Long]("cnt"),
        r.getAs[Long]("npos")))
    val m = rows.map(_._2).sum
    require(m <= maxN,
      s"wilcoxonSignedRankExact: $m nonzero pairs exceed the exact-tail " +
        s"bound $maxN — use wilcoxonSignedRank's normal approximation")
    val w2Plus = rows.map { case (r2, _, npos) => r2 * npos }.sum
    val w2Minus = rows.map { case (r2, cnt, npos) => r2 * (cnt - npos) }.sum
    // generating function over all m signed ranks (each of the cnt
    // tied ranks flips independently): coeff[s] = #assignments with
    // positive doubled-rank sum s. Long fast path while every count
    // fits (Σ coeff = 2^m, so m ≤ 62 is overflow-safe); BigInt beyond.
    val total = rows.map { case (r2, cnt, _) => r2 * cnt }.sum
    // ONE generic shift-DP body; the carrier type is the only dispatch.
    // T is erased (a local def can't be @specialized), so the Long path
    // boxes through the Function2 bridge — acceptable because maxN caps
    // the DP at ~125k cells; if the exact tail ever grows, restore a
    // concrete Long loop rather than trusting specialization here.
    def shiftDp[T](zero: T, one: T, plus: (T, T) => T, toBig: T => BigInt)
                  (implicit ct: scala.reflect.ClassTag[T])
    : (Long => BigInt, Long => BigInt) = {
      val coeff = Array.fill[T](total.toInt + 1)(zero)
      coeff(0) = one
      var used = 0L
      rows.foreach { case (r2, cnt, _) =>
        (1L to cnt).foreach { _ =>
          used += r2
          var s = used.toInt
          while (s >= r2) {
            coeff(s) = plus(coeff(s), coeff(s - r2.toInt))
            s -= 1
          }
        }
      }
      ((ge: Long) => (ge.max(0L).toInt to total.toInt)
         .foldLeft(BigInt(0))((a, i) => a + toBig(coeff(i))),
       (x: Long) => (0 to x.min(total).toInt)
         .foldLeft(BigInt(0))((a, i) => a + toBig(coeff(i))))
    }
    val (tail, le) =
      if (m <= 62) shiftDp[Long](0L, 1L, _ + _, BigInt(_))
      else shiftDp[BigInt](BigInt(0), BigInt(1), _ + _, identity)
    val denom = BigInt(2).pow(m.toInt)
    val pGreater = BigDecimal(tail(w2Plus)) / BigDecimal(denom)
    val pLess = BigDecimal(le(w2Plus)) / BigDecimal(denom)
    val pTwo = (BigDecimal(2) * pGreater.min(pLess)).min(BigDecimal(1))
    val spark = df.sparkSession
    import spark.implicits._
    Seq((w2Plus.toDouble / 2, w2Minus.toDouble / 2, m,
      pGreater.toDouble, pLess.toDouble, pTwo.toDouble))
      .toDF("w_plus", "w_minus", "n", "p_greater", "p_less", "p_two_sided")
  }

  /** T13 — Kruskal-Wallis H across the groups of `groupCol` (tie-corrected).
    * H = [12/(N(N+1)) Σ R_g²/n_g − 3(N+1)] / (1 − Σ(τ³−τ)/(N³−N)).
    * Ref: wine nb 11 cell 50; iris stat nb cell 3. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
    val ranked = Ranks.byValue(base, valueCol)
      .select(col(valueCol), col("avg_rank"), col("cnt"))
    val tie = ranked.agg(Ranks.tieTerm(ranked).as("tie"), sum("cnt").as("n_tot"))
    val perGroup = base.join(ranked.drop("cnt"), Seq(valueCol))
      .groupBy(groupCol)
      .agg(dsum(col("avg_rank")).as("r_g"), count(lit(1)).cast("double").as("n_g"))
    // Σ R_g²/n_g is accumulated in NORMALIZED form Σ (R_g/N)(R_g/n_g):
    // raw R_g² terms overflow the exact range of the decimal accumulation
    // (see Num), the normalized terms never do. H = 12/(N+1)·S − 3(N+1).
    perGroup.crossJoin(tie).agg(
      dsum(col("r_g") / col("n_tot") * (col("r_g") / col("n_g"))).as("s_norm"),
      count(lit(1)).cast("long").as("k"),
      max("tie").as("tie"), max("n_tot").as("n_tot")
    ).select(
      ((lit(12.0) / (col("n_tot") + 1) * col("s_norm")
        - (col("n_tot") + 1) * 3.0) /
        // N³ in DOUBLE: a 10M-row input overflows the long cube (found
        // by the sf10 gate); exact while N³ < 2^53, deterministic and
        // engine-identical rounding beyond
        (lit(1.0) - col("tie") /
          (col("n_tot").cast("double") * col("n_tot").cast("double")
            * col("n_tot").cast("double") - col("n_tot").cast("double"))))
        .as("h"),
      (col("k") - 1).as("dof"))
  }

  /** T13 — one-way ANOVA F over the groups of `groupCol`.
    * Ref: wine nb 11 cell 50 (`f_oneway`). */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val v = col(valueCol)
    val g = df.filter(v.isNotNull).groupBy(groupCol)
      .agg(count(v).cast("double").as("n_g"), dsum(v).as("s_g"), dsum(v * v).as("ss_g"))
    g.agg(
      sum("n_g").as("n"), dsum(col("s_g")).as("s"), dsum(col("ss_g")).as("ss"),
      dsum(col("s_g") / col("n_g") * col("s_g")).as("sum_gm"),
      count(lit(1)).cast("double").as("k")
    ).select(
      (((col("sum_gm") - col("s") * col("s") / col("n")) / (col("k") - 1)) /
        ((col("ss") - col("sum_gm")) / (col("n") - col("k")))).as("f"),
      (col("k") - 1).cast("long").as("df1"),
      (col("n") - col("k")).cast("long").as("df2"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic (distribution drift between
    * two groups — the train/test-shift check of
    * experiments/train_test_comparison.py done exactly):
    * D = max_v |F1(v) − F2(v)|. The two cumulative counts are distributed
    * prefix sums over the DISTINCT-VALUE relation (no global-sort window);
    * the max runs over |f1·n2 − f2·n1| in exact integer (decimal) space,
    * and only the O(1) final division touches floating point —
    * engine-independent to the last bit while n1·n2 < 2^53. */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             g1: String, g2: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pool = df.filter(col(groupCol).isin(g1, g2) && col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"),
        when(col(groupCol) === g1, 1L).otherwise(0L).as("__i1"))
    val counts = pool.groupBy("__v")
      .agg(count(lit(1)).as("cnt"), sum("__i1").as("c1"))
      .withColumn("c2", col("cnt") - col("c1"))
    val totals = counts.agg(
      sum("c1").cast(dec).as("n1"), sum("c2").cast(dec).as("n2"))
    val cum = graft.ops.Prefix
      .runningSums(counts, Seq(col("__v")),
        Seq(col("c1") -> "__f1", col("c2") -> "__f2"))
      .crossJoin(broadcast(totals))
      .select(col("__f1").cast(dec).as("f1"), col("__f2").cast(dec).as("f2"),
        col("n1"), col("n2"))
    cum.agg(
      max(abs(col("f1") * col("n2") - col("f2") * col("n1"))).as("__d"),
      max("n1").as("__n1"), max("n2").as("__n2"))
      .select(
        (col("__d").cast("double") /
          (col("__n1") * col("__n2")).cast("double")).as("ks"),
        col("__d").cast("long").as("d_scaled"),
        col("__n1").cast("long").as("n1"), col("__n2").cast("long").as("n2"))
  }

  /** Calibration bins (reliability curve): fixed-width probability bins,
    * per bin the exact positive fraction and the decimal-exact mean
    * predicted probability. Pure single-pass aggregation. */
  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    val p = col(probCol)
    val bin = least(floor(p * nBins), lit((nBins - 1).toDouble)).cast("int")
    df.filter(p.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        (dsum(p) / count(lit(1))).as("mean_pred"))
      .withColumn("frac_pos", col("n_pos").cast("double") / col("n"))
      .orderBy("bin")
  }
}

/** Driver-side p-value helpers over the collected 1-row statistics — O(1)
  * data, plain Scala math, no external dependency.
  *
  * EXACT tails (round 7, replacing the earlier A&S erf / Hill /
  * Wilson-Hilferty approximations): every distribution routes through the
  * regularized incomplete gamma/beta functions, evaluated by their
  * classical series/continued-fraction expansions (A&S 6.5.29, 6.5.31,
  * 26.5.8; modified Lentz evaluation) with a Lanczos ln Γ. These are the
  * same special functions scipy's `t.sf`/`chi2.sf`/`f.sf`/`norm.cdf`
  * bottom out in, so p-values now agree with scipy to ~1e-14 relative at
  * ANY df — including the small-n tails where the old approximations
  * drifted at the 3rd decimal (StatsSpec pins closed-form references to
  * 1e-12). */
object PValues {

  /** ln Γ(x), x > 0 — Lanczos approximation (g = 7, 9 published
    * coefficients): |relative ε| < 1e-13 over the positive axis. */
  def lnGamma(x: Double): Double =
    if (x < 0.5)
      // reflection keeps small-argument accuracy (needed by b = 1/2 betas)
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    else {
      val g = Array(
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
      val z = x - 1.0
      var a = g(0)
      var i = 1
      while (i < 9) { a += g(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }

  /** Regularized lower incomplete gamma P(a, x): the power series for
    * x < a + 1 (fast there), else 1 − the continued fraction. */
  def regGammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"regGammaP domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) gammaSeries(a, x)
    else 1.0 - gammaContFrac(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) = 1 − P(a, x). */
  def regGammaQ(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"regGammaQ domain: a=$a x=$x")
    if (x == 0) 1.0
    else if (x < a + 1.0) 1.0 - gammaSeries(a, x)
    else gammaContFrac(a, x)
  }

  // P(a,x) = x^a e^-x / Γ(a) · Σ_{n≥0} x^n / (a(a+1)···(a+n))  [A&S 6.5.29]
  private def gammaSeries(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 1000 && math.abs(del) >= math.abs(sum) * 1e-16) {
      ap += 1.0; del *= x / ap; sum += del; n += 1
    }
    sum * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  // Q(a,x) continued fraction [A&S 6.5.31], modified Lentz evaluation
  private def gammaContFrac(a: Double, x: Double): Double = {
    val tiny = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < tiny) d = tiny
      c = b + an / c; if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (i <= 1000 && math.abs(del - 1.0) >= 1e-16)
    h * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  /** Regularized incomplete beta I_x(a, b): continued fraction [A&S
    * 26.5.8], with the symmetry split I_x(a,b) = 1 − I_{1−x}(b,a) so the
    * fraction is always evaluated in its fast-converging region. */
  def regBetaI(x: Double, a: Double, b: Double): Double = {
    require(a > 0 && b > 0 && x >= 0 && x <= 1,
      s"regBetaI domain: x=$x a=$a b=$b")
    if (x == 0) 0.0
    else if (x == 1) 1.0
    else {
      val front = math.exp(a * math.log(x) + b * math.log1p(-x) +
        lnGamma(a + b) - lnGamma(a) - lnGamma(b))
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaContFrac(x, a, b) / a
      else 1.0 - front * betaContFrac(1.0 - x, b, a) / b
    }
  }

  private def betaContFrac(x: Double, a: Double, b: Double): Double = {
    val tiny = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
      val m2 = 2.0 * m
      val even = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + even * d; if (math.abs(d) < tiny) d = tiny
      c = 1.0 + even / c; if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      val odd = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + odd * d; if (math.abs(d) < tiny) d = tiny
      c = 1.0 + odd / c; if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      del = d * c
      h *= del
      m += 1
    } while (m <= 1000 && math.abs(del - 1.0) >= 1e-16)
    h
  }

  /** Standard normal CDF, exact through erfc(y) = Q(1/2, y²). */
  def normalCdf(z: Double): Double = {
    val q = regGammaQ(0.5, z * z / 2.0) // = erfc(|z|/√2)
    if (z >= 0) 1.0 - 0.5 * q else 0.5 * q
  }

  def twoSidedFromZ(z: Double): Double = 2.0 * (1.0 - normalCdf(math.abs(z)))
  def oneSidedGreaterFromZ(z: Double): Double = 1.0 - normalCdf(z)

  /** Student-t two-sided p — exact: p = I_{df/(df+t²)}(df/2, 1/2). */
  def twoSidedFromT(t: Double, df: Double): Double =
    regBetaI(df / (df + t * t), df / 2.0, 0.5)

  /** Chi-squared upper tail — exact: Q(dof/2, x/2). */
  def chi2Sf(x: Double, dof: Double): Double =
    if (x <= 0) 1.0 else regGammaQ(dof / 2.0, x / 2.0)

  /** F upper tail (ANOVA) — exact: I_{d2/(d2+d1·f)}(d2/2, d1/2). */
  def fSf(f: Double, d1: Double, d2: Double): Double =
    if (f <= 0) 1.0 else regBetaI(d2 / (d2 + d1 * f), d2 / 2.0, d1 / 2.0)

  /** Significance stars as in the reference's plots (T14).
    * Ref: cross-validation/wine_analysis.py:296-303. */
  def stars(p: Double): String =
    if (p < 0.001) "***" else if (p < 0.01) "**" else if (p < 0.05) "*" else "ns"
}
