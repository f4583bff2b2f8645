package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric conventions shared by engine operators and their DuckDB oracles.
  *
  * Sums of doubles are order-dependent in IEEE arithmetic, so a distributed
  * sum and a single-threaded oracle sum can differ by far more than any
  * "round to k places" tolerance at 100 TB row counts. We therefore
  * accumulate through exact decimals (order-independent) and cast the exact
  * result back to double — bit-identical on any executor count/plan shape.
  */
object Num {
  /** Order-independent sum of a double column (exact decimal accumulate).
    *
    * Cross-engine caveat: some engines (DuckDB) implement double→decimal
    * casts via a double multiply by 10^scale, which is only exact while
    * |v|·10^scale < 2^53 (≈ |v| < 9e9 at scale 6). Keep per-row inputs
    * below that — normalize large intermediate terms before accumulating
    * (see stats.Tests.kruskalWallis for the pattern). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Higher-precision variant for small-magnitude values (dot products). */
  def dsum12(c: Column): Column = sum(c.cast(DecimalType(30, 12))).cast("double")

  /** Order-independent mean. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample variance from exact sums: (n*Sxx - Sx^2) / (n*(n-1)). */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    (n * dsum(c * c) - dsum(c) * dsum(c)) / (n * (n - lit(1.0)))
  }

  def dstddevSamp(c: Column): Column = sqrt(dvarSamp(c))

  /** Pearson correlation from exact sums (deterministic across plans). */
  def dcorr(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val num = n * dsum(x * y) - dsum(x) * dsum(y)
    val den = sqrt(n * dsum(x * x) - dsum(x) * dsum(x)) *
      sqrt(n * dsum(y * y) - dsum(y) * dsum(y))
    num / den
  }
}

/** Relational operators from the reference's pandas surface (SURVEY.md §2.2-2.6).
  * Each is a pure DataFrame→DataFrame function; Catalyst handles pushdown,
  * pruning and join selection — no manual scheduling.
  */
object Relational {
  import Num._

  /** A2/A3 — `value_counts([normalize=True])`: group count + optional share.
    * The share denominator is a broadcast 1-row total (no empty-frame
    * window — an empty partition spec funnels the grouped relation through
    * one task and is the plan shape this library bans).
    * Ref: final-assignment/experiments/target_eda.py:29-30. */
  def valueCounts(df: DataFrame, c: String, normalize: Boolean = false): DataFrame = {
    val counts = df.groupBy(c).agg(count(lit(1)).as("count"))
    val out =
      if (normalize)
        counts.crossJoin(broadcast(df.agg(count(lit(1)).as("__tot"))))
          .withColumn("pct", col("count") / col("__tot") * 100.0)
          .drop("__tot")
      else counts
    out.orderBy(col(c))
  }

  /** A4 — `pd.crosstab(a, b)` with an explicit pivot domain (skips the extra
    * distinct-values job Spark would otherwise run; mandatory at scale).
    * Ref: final-assignment/experiments/target_eda.py:39-43. */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
               colValues: Seq[String]): DataFrame =
    df.groupBy(rowCol).pivot(colCol, colValues).agg(count(lit(1)))
      .na.fill(0).orderBy(rowCol)

  /** A5 — crosstab with normalize='index' (row shares). The denominator is
    * the TRUE per-group row count (pandas normalize='index' semantics), not
    * the sum of the listed pivot columns — the two differ whenever
    * `colValues` does not enumerate the full domain of `colCol`.
    * Ref: target_eda.py:49-53. */
  def crosstabRowShare(df: DataFrame, rowCols: Seq[String], colCol: String,
                       colValues: Seq[String]): DataFrame = {
    val counted = df.groupBy(rowCols.map(col): _*)
      .pivot(colCol, colValues).agg(count(lit(1))).na.fill(0)
    val totals = df.groupBy(rowCols.map(col): _*)
      .agg(count(lit(1)).as("__row_total"))
    val shares = colValues.map(v => (col(v) / col("__row_total")).as(v))
    counted.join(totals, rowCols)
      .select(rowCols.map(col) ++ shares: _*).orderBy(rowCols.map(col): _*)
  }

  /** A4 — `pd.crosstab(..., margins=True)`: the contingency table plus an
    * "All" grand-total row (via rollup — one aggregation, not a second
    * pass) and an "All" row-total column.
    * Ref: target_eda.py:39-43 (margins=True); 1-1.data_processing.ipynb cell 9. */
  def crosstabWithMargins(df: DataFrame, rowCol: String, colCol: String,
                          colValues: Seq[String],
                          totalCol: String = "all_total"): DataFrame = {
    // conditional sums, not pivot: Spark rejects PIVOT after ROLLUP, and
    // count(*) gives the TRUE row total even if colValues is partial
    val cells = colValues.map(v =>
      sum(when(col(colCol) === v, 1L).otherwise(0L)).as(v))
    // grouping() (not a null-coalesce on the group key) tags the rollup
    // grand-total row: a genuine NULL value in rowCol must NOT be conflated
    // with the "All" margin — the SQL form distinguishes them via GROUPING()
    val aggs = cells ++ Seq(count(lit(1)).as(totalCol),
      grouping(col(rowCol)).cast("int").as("__is_total"))
    df.rollup(rowCol).agg(aggs.head, aggs.tail: _*)
      .withColumn(rowCol,
        when(col("__is_total") === 1, lit("All")).otherwise(col(rowCol).cast("string")))
      .orderBy(col("__is_total"), col(rowCol))
      .drop("__is_total")
  }

  /** A6 — pivot_table(index, columns, values, aggfunc=mean).
    * Ref: wine-classification-dacon nb 11 cell 47. */
  def pivotTable(df: DataFrame, index: String, columns: String,
                 colValues: Seq[String], values: Column): DataFrame =
    df.groupBy(index).pivot(columns, colValues).agg(values).orderBy(index)

  /** A7 — melt/unpivot. Ref: cross-validation/wine_analysis.py:188-189. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray,
      valueCols.map(c => col(c).cast("double")).toArray, varName, valueName)

  /** A8 — `describe(include='all')` for CATEGORICAL columns: non-null
    * count, distinct count, mode and its frequency per column (pandas'
    * count/unique/top/freq rows). One unpivot → one (col, value) count →
    * one window; never a per-column job. Ties on the mode break to the
    * smallest value (deterministic, unlike pandas' first-seen).
    * Ref: wine nb 03 cell 7; teamProject/eda.ipynb cell 6. */
  def describeCategorical(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df.unpivot(Array.empty[Column],
        cols.map(c => col(c).cast("string")).toArray, "col_name", "value")
      .filter(col("value").isNotNull)
    val counted = melted.groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy(col("cnt").desc, col("value").asc)
    counted.withColumn("rn", row_number().over(w))
      .groupBy("col_name").agg(
        sum("cnt").as("count"),
        count(lit(1)).as("unique"),
        max(when(col("rn") === 1, col("value"))).as("top"),
        max(when(col("rn") === 1, col("cnt"))).as("freq"))
      .orderBy("col_name")
  }

  /** A9 — per-column null rate in ONE aggregate pass (no per-column jobs).
    * Ref: 1-1.data_processing.ipynb cell 11. */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      avg(when(col(c).isNull, 1.0).otherwise(0.0)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column], cols.map(col).toArray, "col_name", "null_rate")
  }

  /** A10 — per-row null count across columns. Ref: 1-1 nb cell 10. */
  def rowNullCount(cols: Seq[String]): Column =
    cols.map(c => when(col(c).isNull, 1).otherwise(0)).reduce(_ + _)

  /** A11 — drop columns above a null-rate threshold. Only the per-column
    * rates (one row per column) ever reach the driver. Ref: 1-1 nb cell 11. */
  def dropMostlyNullCols(df: DataFrame, cols: Seq[String], threshold: Double): DataFrame = {
    val rates = nullRates(df, cols).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dropped = cols.filter(c => rates(c) >= threshold)
    df.drop(dropped: _*)
  }

  /** J4/U1 — vertical concat over the intersection of columns, ordered by
    * the RIGHT frame's column order (reference orders by df23).
    * Ref: 1-1.data_processing.ipynb cell 4. */
  def unionOnCommonColumns(a: DataFrame, b: DataFrame): DataFrame = {
    val common = b.columns.filter(a.columns.toSet)
    a.select(common.map(col): _*).unionByName(b.select(common.map(col): _*))
  }
}

/** Row-level cleaning operators (SURVEY.md §2.2 P8-P17). All are Column
  * combinators — they stay inside whole-stage codegen. */
object Cleaning {

  /** P8/P15 — threshold binarize (`(x > t).astype(int)`).
    * Ref: 1-2.labeling_XYdataset.ipynb cell 3; src/utils/metrics.py:13. */
  def binarize(c: Column, threshold: Double, strict: Boolean = false): Column =
    when(if (strict) c > threshold else c >= threshold, 1).otherwise(0)

  /** P9 — dict decode (`Series.map({...})`). Ref: iris_analysis.ipynb cell 0. */
  def decode[K](c: Column, mapping: Map[K, String]): Column =
    mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === lit(k), lit(v)).otherwise(acc)
    }

  /** P10 — sentinel rewrite from a codebook: some codes become -1
    * (not-applicable), some become null (unknown).
    * Ref: 1-1.data_processing.ipynb cell 6. */
  def rewriteSentinels(c: Column, toMinusOne: Seq[Double], toNull: Seq[Double]): Column = {
    val base = if (toNull.nonEmpty) when(c.isin(toNull: _*), lit(null)) else when(lit(false), lit(null))
    val withNa = if (toMinusOne.nonEmpty) base.when(c.isin(toMinusOne: _*), lit(-1.0)) else base
    withNa.otherwise(c)
  }

  /** P16 — clip. Ref: src/ensemble/alternative.py:212. */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** P17 — pd.cut: half-open (lo, hi] bins with labels, like pandas default.
    * Ref: target_eda.py:48. */
  def cut(c: Column, bins: Seq[Double], labels: Seq[String]): Column = {
    require(bins.size == labels.size + 1)
    labels.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (lbl, i)) =>
      when(c > bins(i) && c <= bins(i + 1), lit(lbl)).otherwise(acc)
    }
  }
}

/** Skew mitigation for joins/aggregations at scale. AQE's skew-join
  * handling covers sort-merge joins; explicit salting remains the tool for
  * skewed AGGREGATION keys and broadcast-ineligible skewed joins. */
object Skew {

  /** Working columns these operators add internally. Inputs that already
    * contain one would silently collide with withColumn — refuse loudly. */
  private val reserved = Set("__salt", "__partial", "__n", "__s")
  private def requireNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input already contains reserved working column(s) ${clash.mkString(", ")}")
  }

  /** Deterministic per-row salt in [0, salts). crc32(null) is null, which
    * would send every null-salt row of a hot key to ONE reducer — fall back
    * to a per-row id so nulls spread too (the downstream aggregates are
    * associative, so salt assignment never affects the result). */
  private def saltExpr(saltFromCol: String, salts: Int) =
    pmod(coalesce(crc32(col(saltFromCol).cast("string")),
      monotonically_increasing_id()), lit(salts.toLong))

  /** Two-phase salted aggregation: count rows per (key, salt) with a
    * deterministic per-row salt, then merge the partials per key. The first
    * shuffle spreads a hot key over `salts` reducers. */
  def saltedCount(df: DataFrame, keyCol: String, saltFromCol: String,
                  salts: Int): DataFrame = {
    requireNoReserved(df)
    df.withColumn("__salt", saltExpr(saltFromCol, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol)).agg(sum("__partial").as("n"))
  }

  /** Two-phase salted count + exact-decimal sum: the general salted
    * aggregate for additive statistics. Phase 1 shuffles on (key, salt) —
    * a hot key's rows spread over `salts` reducers — and accumulates the
    * value through DECIMAL (associative, so the two-phase regrouping is
    * BIT-IDENTICAL to a single-phase sum); phase 2 merges `salts` partials
    * per key, a relation bounded by |keys|·salts. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String,
                saltFromCol: String, salts: Int): DataFrame = {
    requireNoReserved(df)
    df.withColumn("__salt", saltExpr(saltFromCol, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .as("__s"))
      .groupBy(col(keyCol))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum_value"))
  }

  /** Salted join of a skewed fact against a small-ish dim that cannot be
    * broadcast: replicate the dim `salts`× and split the fact by salt so a
    * hot key's rows land on `salts` different reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFromCol: String, salts: Int): DataFrame = {
    requireNoReserved(fact); requireNoReserved(dim)
    val saltedFact = fact.withColumn("__salt", saltExpr(saltFromCol, salts))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}

/** Ranking / window operators (SURVEY.md §2.5). */
/** Runtime Bloom-filter join reduction — the explicit form of Spark's
  * row-level runtime filtering, under caller control. When a join is
  * selective and the probe side is huge, shipping a Bloom filter of the
  * build keys to the probe scan drops non-matching rows BEFORE the
  * shuffle: the probe side never pays exchange cost for rows the join
  * would discard. False positives only weaken the pre-filter; the exact
  * join afterwards keeps semantics precise. */
object Bloom {

  /** Semi-join `probe` to `build`, pre-filtered by a Bloom filter over the
    * build keys (built in one aggregation, broadcast to the probe).
    * BloomFilterAggregate/BloomFilterMightContain are the expressions
    * Spark's own InjectRuntimeFilter rule plants; they are not SQL-visible
    * (internal registry), so they are constructed directly. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    val buildHash = new XxHash64(Seq(Bridge.expression(build(buildKey))))
    val agg = Bridge.column(new BloomFilterAggregate(buildHash,
      Literal(expectedItems), Literal(8L * expectedItems)).toAggregateExpression())
    // might_contain requires a CONSTANT filter: evaluate the one-row
    // aggregate eagerly (an O(filter-size) blob — fitted-parameter scale,
    // not row data) and inline it; Spark ships it with the task binary.
    val bf = build.agg(agg.as("__bf")).head().getAs[Array[Byte]](0)
    val probeHash = new XxHash64(Seq(Bridge.expression(probe(probeKey))))
    val contains = Bridge.column(
      BloomFilterMightContain(Literal(bf, BinaryType), probeHash))
    probe.filter(contains)
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}

/** Distributed prefix sums over a total row order — the building block
  * behind scalable ranking, NTILE, rank statistics, CDFs, and sequence
  * packing. Range-partition the order key, compute per-partition running
  * sums in parallel, and turn them global with per-bucket offsets. NO
  * window anywhere runs without a partition — the offsets come from a
  * broadcast self-join over the ~numPartitions bucket totals (bounded by
  * construction, never by the data), so plans stay free of the
  * single-partition WindowExec that serializes at scale. Results are
  * exact integer arithmetic, independent of the bucketing. */
object Prefix {

  /** EXCLUSIVE prefix sums over a tiny keyed totals relation (one row per
    * bucket): for each row, the sum of every `sumCols` input over buckets
    * strictly before it in `pidCol` order. A broadcast inequality
    * self-join — O(buckets²) on a buckets-sized relation — instead of a
    * global-sort window, so the plan carries no partition-less WindowExec.
    * Returns (pidCol, outCol…). */
  def bucketOffsets(totals: DataFrame, pidCol: String,
                    sumCols: Seq[(String, String)]): DataFrame = {
    val b = totals.select(col(pidCol).as("__p2") +:
      sumCols.map { case (in, _) => col(in).as(s"__b_$in") }: _*)
    val aggs = sumCols.map { case (in, out) =>
      coalesce(sum(s"__b_$in"), lit(0L)).as(out)
    }
    totals.join(broadcast(b), col("__p2") < col(pidCol), "left")
      .groupBy(col(pidCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Adds one inclusive running sum per `(value, outCol)` pair over
    * `order` (which must be a total order for deterministic output).
    * Values are accumulated as longs (counts/ranks/token totals). */
  def runningSums(df: DataFrame, order: Seq[Column],
                  values: Seq[(Column, String)]): DataFrame = {
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val named = values.zipWithIndex.map { case ((v, out), i) => (s"__v_$i", out, v) }
    val withVals = named.foldLeft(df) { case (acc, (vc, _, v)) =>
      acc.withColumn(vc, v.cast("long"))
    }
    val ranged = withVals
      .repartitionByRange(nBuckets, order: _*)
      .withColumn("__pid", spark_partition_id())
      // persist is CORRECTNESS here, not caching: repartitionByRange
      // samples its bounds with a seed derived from the RDD id, so two
      // independent evaluations of this subtree can place the same row in
      // different partitions — the offsets branch and the main branch
      // MUST see one materialization (verified by GraphExtSpec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totAggs = named.map { case (vc, _, _) => sum(vc).as(s"__t_$vc") }
    val totals = ranged.groupBy("__pid").agg(totAggs.head, totAggs.tail: _*)
    val offDf = bucketOffsets(totals, "__pid",
      named.map { case (vc, _, _) => s"__t_$vc" -> s"__off_$vc" })
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = ranged.join(broadcast(offDf), Seq("__pid"))
    val summed = named.foldLeft(joined) { case (acc, (vc, out, _)) =>
      acc.withColumn(out, sum(vc).over(w) + col(s"__off_$vc"))
    }
    summed.drop("__pid" +: named.flatMap { case (vc, _, _) =>
      Seq(vc, s"__off_$vc") }: _*)
  }

  /** Adds `outCol` = inclusive running sum of `value` over `order`. */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column,
                 outCol: String): DataFrame =
    runningSums(df, order, Seq(value -> outCol))
}

object Ranking {

  /** W2 — global top-k with a deterministic tiebreak. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-n over ARBITRARY row payloads without a window sort:
    * the bounded-heap [[graft.expressions.TopKRows]] aggregate picks the
    * winning (score, id) pairs — map tasks emit ≤ n rows per group before
    * the exchange, where `row_number() OVER (PARTITION BY …)` shuffles
    * and sorts every row — and the full payload joins back by id
    * afterwards. Requires `idCol` to be GLOBALLY unique (it is the
    * join-back key) and castable to long; ranking order is (scoreCol
    * DESC, idCol ASC). Output = df's columns + `rankCol`. */
  def topNPerGroupAgg(df: DataFrame, groupCols: Seq[String],
                      scoreCol: String, idCol: String, n: Int,
                      rankCol: String = "rnk"): DataFrame = {
    val winners = df
      .groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.TopKRows
        .topRows(col(scoreCol), col(idCol), n).as("__top"))
      .select(posexplode(col("__top")))
      .select(col("col.id").as("__id"),
        (col("pos") + 1).cast("int").as(rankCol))
    df.join(winners, col(idCol).cast("long") === col("__id"))
      .drop("__id")
  }

  /** Global top-k with a 1-based rank column, WITHOUT a global-sort
    * window: the k rows come from orderBy+limit (TakeOrderedAndProject —
    * per-partition top-k merged on the driver), and the rank of each
    * survivor is 1 + |rows strictly before it| counted by a broadcast
    * self-join over the k-row result. `keys` = (column, descending) pairs
    * forming a TOTAL order (include a tiebreak key), so ranks are unique
    * and reproduce `row_number() OVER (ORDER BY …)` exactly at any scale. */
  def topKRanked(df: DataFrame, keys: Seq[(String, Boolean)], k: Int,
                 rankCol: String = "rank"): DataFrame = {
    val sortCols = keys.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }
    val top = df.orderBy(sortCols: _*).limit(k)
    val b = top.select(keys.map { case (c, _) =>
      col(c).as(s"__b_$c") } :+ lit(1).as("__m"): _*)
    // lexicographic "b sorts strictly before a" over the (mixed-direction)
    // key list
    def before(i: Int): Column = {
      val (c, desc) = keys(i)
      val lt = if (desc) col(s"__b_$c") > col(c) else col(s"__b_$c") < col(c)
      if (i == keys.size - 1) lt
      else lt || (col(s"__b_$c") === col(c) && before(i + 1))
    }
    // the TOTAL-order contract is enforced, not just documented: two of
    // the k survivors sharing the full key tuple would silently collapse
    // in the grouped rank attach (fewer than k rows out, shifted ranks).
    // Joining equals alongside strictly-befores costs nothing (every row
    // matches at least itself) and lets the aggregate count key-tuple
    // multiplicity — >1 raises in-plan with the offending key list.
    val eqAll = keys.map { case (c, _) => col(s"__b_$c") <=> col(c) }
      .reduce(_ && _)
    val strictCnt =
      sum(when(col("__m").isNotNull && !coalesce(eqAll, lit(false)), 1L)
        .otherwise(0L))
    val eqCnt = sum(when(coalesce(eqAll, lit(false)), 1L).otherwise(0L))
    top.join(broadcast(b), before(0) || eqAll, "left")
      .groupBy(top.columns.map(col): _*)
      .agg((strictCnt + 1).cast("int").as(rankCol), eqCnt.as("__eq"))
      .withColumn(rankCol,
        when(col("__eq") > 1, raise_error(
          lit(s"topKRanked: keys ${keys.map(_._1).mkString("(", ",", ")")} " +
            s"are not a total order — duplicate key tuple among the top-$k rows"))
          .cast("int"))
        .otherwise(col(rankCol)))
      .drop("__eq")
  }

  /** W6/W8 — top-n rows per group (row_number window, no global sort). */
  def topNPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column],
                   n: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** W4 — rank rows per metric column (pandas rank(method='min') ≡ SQL
    * RANK, descending), then the mean rank across metrics, sorted best-
    * first. Ranks come from a broadcast self-join (rank = 1 + |rows with a
    * strictly better metric|), not a global-sort window — the input is an
    * already-aggregated relation (models, features, nations — bounded
    * cardinality), so the quadratic count is trivial while the plan stays
    * free of single-partition WindowExec; don't feed this raw fact tables.
    * Ref: wine-classification-dacon nb 11 cell 48. */
  def meanRankAcross(df: DataFrame, keyCol: String, metrics: Seq[String]): DataFrame = {
    val ranked = metrics.foldLeft(df) { (acc, m) =>
      acc.join(broadcast(df.select(col(m).as(s"__b_$m"))),
          col(s"__b_$m") > col(m), "left")
        .groupBy(acc.columns.map(col): _*)
        .agg((count(col(s"__b_$m")) + 1).cast("int").as(s"${m}_rank"))
    }
    val meanRank = metrics.map(m => col(s"${m}_rank")).reduce(_ + _)
      .cast("double") / metrics.size
    ranked.withColumn("mean_rank", meanRank)
      .orderBy(col("mean_rank"), col(keyCol))
  }

  /** Exact global NTILE without a single-partition sort: range-partition
    * on the order key, per-partition row_number in parallel, and only the
    * ~numPartitions bucket counts visit the driver to become row-number
    * offsets. Bucket assignment then reproduces SQL NTILE exactly
    * (front-loaded remainder: the first n mod k buckets get one extra
    * row). The 100 TB shape for decile/percentile bucketing — a plain
    * `ntile(k).over(Window.orderBy(...))` funnels every row through ONE
    * task. Order must be total (include a tiebreak key) for deterministic
    * output. */
  def ntileExact(df: DataFrame, order: Seq[Column], k: Int,
                 bucketCol: String = "bucket"): DataFrame = {
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nBuckets, order: _*)
      .withColumn("__pid", spark_partition_id())
      // persist pins ONE range partitioning: the bounds sampling is
      // seeded by RDD id, so re-evaluation could repartition differently
      // between the offsets/total branches and the main branch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket-start offsets and the grand total IN-PLAN (no driver action,
    // no global window: the per-bucket counts relation is ~numPartitions
    // rows, so its exclusive prefix comes from Prefix.bucketOffsets)
    val cnts = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
    val offDf = Prefix.bucketOffsets(cnts, "__pid", Seq("__c" -> "__off"))
    val totDf = cnts.agg(sum("__c").as("__n"))
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    // SQL NTILE: rows 1..r*(q+1) fill the first r = n%k buckets of size
    // q+1 = n/k+1; the rest fill buckets of size q (integer DIV — no
    // float rounding)
    val bucketSql =
      s"""CAST(CASE WHEN (__n % $k) > 0
         |   AND __rn <= (__n % $k) * ((__n DIV $k) + 1)
         | THEN ((__rn - 1) DIV ((__n DIV $k) + 1)) + 1
         | ELSE (__n % $k) + ((__rn - 1 - (__n % $k) * ((__n DIV $k) + 1))
         |   DIV greatest(__n DIV $k, 1)) + 1
         | END AS INT)""".stripMargin
    ranged.join(broadcast(offDf), Seq("__pid"))
      .crossJoin(broadcast(totDf))
      .withColumn("__rn", row_number().over(w).cast("long") + col("__off"))
      .withColumn(bucketCol, expr(bucketSql))
      .drop("__pid", "__off", "__rn", "__n")
  }

  /** A12 — deterministic grouped mode: most frequent value, ties broken by
    * smallest value (stable across engines, unlike `mode()`).
    * Ref: legacy/modeling.py:116-119. */
  def modePerGroup(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy((keyCols :+ valueCol).map(col): _*).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select((keyCols :+ valueCol).map(col): _*)
  }
}
