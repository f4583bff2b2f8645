package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CoreQueries

/** Physical-plan assertions: the optimizations the engine RELIES on at
  * 100 TB must actually appear in the plans Catalyst produces — predicate
  * pushdown into the parquet scan, broadcast joins for dims, whole-stage
  * codegen on the hot aggregation path. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  def planOf(q: String): String =
    CoreQueries.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("filters push down into the parquet scan") {
    val plan = planOf("q_p4_filter")
    assert(plan.contains("PushedFilters:"), "no pushed filters section")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,30.0)"),
      s"quantity filter not pushed:\n${plan.take(2000)}")
    // projection pruning: untouched wide columns must not be read
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"))
    assert(!plan.split("ReadSchema")(1).split("\n")(0).contains("l_tax"),
      "scan reads columns the query never uses")
  }

  test("dimension joins broadcast (no shuffle of the fact table for dims)") {
    val plan = planOf("q_j2_region_revenue")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins for nation/region:\n${plan.take(2000)}")
  }

  test("aggregation pipeline: map-side combine + whole-stage codegen") {
    val df = CoreQueries.queries("q_a1_tpch_q1")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // partial aggregation (map-side combine) before the shuffle
    assert(plan.contains("partial_sum"), "no map-side partial aggregation")
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
    // whole-stage codegen spans exist (AQE wraps the plan lazily, so
    // inspect with AQE off — production runs keep AQE on)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val noAqe = CoreQueries.queries("q_a1_tpch_q1")(spark, sfDir)
      val codegen = noAqe.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.contains("Found 0 WholeStageCodegen"),
        s"no codegen subtrees:\n${codegen.take(500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q_w1_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"limit+orderBy should become top-k:\n${plan.take(2000)}")
  }

  test("semi and anti joins stay joins (no materialized subqueries)") {
    assert(planOf("q_j_semi").contains("LeftSemi"))
    assert(planOf("q_j_anti").contains("LeftAnti"))
  }

  test("LSH blocking plans are equi-joins on bucket keys, never cartesian") {
    // brute-force ANN broadcasts deliberately; the LSH-blocked paths must
    // not — a cartesian/NLJ here is the n² failure mode at 100 TB
    for (q <- Seq("q_x_embed_neardup", "q_v_lsh_ann", "q_x_corpus_pipeline")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q plan contains a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plan contains a nested-loop join")
    }
  }

  test("edit-dedup plan: band equi-join, L1 prefilter below the pair exchange") {
    // AQE off so the executed plan is a plain tree (AdaptiveSparkPlanExec
    // is a leaf and hides its subtree from collect)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_x_edit_neardup")(spark, sfDir)
        .queryExecution.executedPlan
      val s = exec.toString
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"),
        "edit-dedup blocking must stay an equi-join")
      assert(s.toLowerCase.contains("intl1capped"),
        "the codegen'd L1 lower-bound prefilter is missing from the plan")
      // the prefilter must run BELOW an exchange (map side of the pair
      // distinct), so only surviving candidate ids cross the shuffle
      val exchanges = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.exists(_.toString.toLowerCase.contains("intl1capped")),
        "IntL1Capped must filter on the map side, below the dedup exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("as-of join plan contains no physical join at all") {
    // the operator is union + window — a Join node would mean the
    // per-row-range-probe shape it exists to avoid
    val plan = SparkEntry.queries("q_j_asof")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof plan has a join:\n${plan.take(1500)}")
    assert(plan.contains("Window"))
  }

  test("interval join is a bucket equi-join, not a nested loop") {
    val plan = SparkEntry.queries("q_j_interval")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a non-equi plan:\n${plan.take(1500)}")
  }

  test("ivf centroid pick is a top-N, not a global sort window") {
    val e = graft.core.Tables(spark, sfDir, "embeddings")
    val (centroids, _) = graft.sim.Similarity.ivfIndex(e, 8)
    val plan = centroids.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"centroid pick should be TakeOrdered:\n${plan.take(1500)}")
  }

  test("ntileExact never funnels the data through a single partition") {
    import org.apache.spark.sql.functions.col
    val o = graft.core.Tables(spark, sfDir, "orders")
    val plan = graft.ops.Ranking
      .ntileExact(o, Seq(col("o_totalprice"), col("o_orderkey")), 10)
      .queryExecution.executedPlan.toString
    // the data path is range-partitioned; SinglePartition may appear only
    // for the ~numPartitions offsets relation, never feeding a sort of
    // the main data (a plain ntile window would show Exchange
    // SinglePartition directly above the orders scan)
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange:\n${plan.take(1500)}")
    val mainSorts = plan.split("\n").count(l =>
      l.contains("Sort ") && l.contains("o_totalprice"))
    assert(mainSorts >= 1, "expected the per-bucket sort")
  }

  test("stratified holdout: bucketed rank, one scan (reused exchange), " +
    "no label-only window") {
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables(spark, sfDir, "events")
      .select(col("event_id"), (col("value") > 50).cast("int").as("label"))
    // AQE off: exchange reuse is then a static physical-planning rule,
    // so the plan shows it without executing (AQE reuses at runtime via
    // its stage cache, which the printed plan does not surface)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try graft.ml.Split.tagStratifiedHoldout(e, "event_id", "label", 0.2)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the offsets branch must NOT re-scan the source: both branches hang
    // off one (label, bucket) exchange
    assert(plan.contains("ReusedExchange"),
      s"offsets branch re-computed the scan:\n${plan.take(3000)}")
    // every window partitions by (label, bucket) or the tiny offsets
    // keys — never by the label alone (a #labels-task funnel; measured
    // 2 tasks x 5M-row sorts at sf10)
    plan.split("\n").filter(_.contains("Window ")).foreach { l =>
      assert(!(l.contains("partitionBy") && l.contains("label#") &&
        !l.contains("__b") && !l.contains("__cb")),
        s"label-only window partition:\n$l")
    }
    // exactly one scan of the events source
    assert(plan.split("\n").count(_.contains("FileScan parquet")) == 1,
      "expected a single source scan")
  }

  test("cube expands grouping sets before the exchange (partial agg)") {
    val plan = SparkEntry.queries("q_a_cube")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "cube should use Expand")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "cube lost map-side combine")
  }

  test("PII redaction is a pure narrow map stage (no exchange at all)") {
    import org.apache.spark.sql.functions.col
    val df = graft.core.Tables(spark, sfDir, "documents")
      .select(graft.text.TextOps.redactPii(col("text")).as("red"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"redaction should not shuffle:\n${plan.take(1200)}")
  }

  test("decontamination joins on the gram hash, never text") {
    val plan = SparkEntry.queries("q_x_decontam")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // r14: one LEFT join against the distinct eval grams replaced the
    // semi join + second full gram pass (both counts off one aggregate);
    // the join key must still be the md5 hash, never document text
    // exclude topKRanked's bounded rank self-join (an inequality join
    // over the 10-row TakeOrdered result — the one allowed nested loop)
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("Outer") &&
        !l.contains("n_contaminated")).toSeq
    assert(joinLines.nonEmpty, "expected a left join on gram hashes")
    assert(joinLines.forall(l => l.contains("gh#")),
      s"gram join must key on the md5 hash, got: ${joinLines.mkString(";")}")
    assert(!plan.contains("CartesianProduct"),
      "decontamination must stay an equi-join")
    // the top-10 is TakeOrdered + a rank self-join over the 10-row result
    // (topKRanked) — the only nested-loop join allowed is that bounded one
    assert(plan.contains("TakeOrderedAndProject"),
      "contamination top-k should be TakeOrdered, not a global-sort window")
  }

  test("no query plan contains a partition-less Window (the 100 TB ban)") {
    // A Window with an empty partition spec funnels its whole input
    // through ONE task ("WARN WindowExec: No Partition Defined") — the
    // single plan shape that silently serializes at scale. Every query in
    // the public surface must rank/accumulate via TakeOrdered, partitioned
    // windows, or distributed prefix sums (ops.Prefix) instead.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"global-sort windows in: ${offenders.mkString(", ")}")
  }

  test("bm25 filters to query terms BEFORE the doc-term aggregation") {
    // r14: the corpus tokenizes ONCE into a checkpointed (id, dl, hits)
    // base, which truncates the final plan — assert the property on the
    // UN-checkpointed base plan instead (checkpoint=false test hook):
    // the array-level term filter sits below the tf aggregation, so the
    // grouped relation stays |terms|-bounded per doc
    import graft.text.Retrieval
    import graft.queries.{PipeQueries, Fixtures}
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val base = Retrieval.queryTermBase(docs, "doc_id", "text",
      PipeQueries.Bm25Terms, checkpoint = false)
    val plan = Retrieval.bm25FromBase(base, "doc_id")
      .queryExecution.optimizedPlan.toString
    // plans print root-first, so "below the Aggregate" = later in the
    // string: the filter/IN-list over the token array must appear after
    // the first Aggregate node
    val aggIdx = plan.indexOf("Aggregate")
    val inIdx = Seq(plan.indexOf(" IN ("), plan.indexOf("INSET"),
      plan.indexOf("filter(")).max
    assert(aggIdx >= 0 && inIdx > aggIdx,
      s"term filter not below the aggregate:\n${plan.take(1500)}")
  }

  test("TPC-H Q3 broadcasts the filtered dim and ends in a top-k") {
    val plan = SparkEntry.queries("q_j_tpch_q3")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "customer dim should broadcast")
    assert(plan.contains("TakeOrderedAndProject"),
      "revenue top-10 should be a top-k, not a global sort")
  }

  test("gap fill aggregates before densifying (partial agg + explode after)") {
    val df = graft.ops.Temporal.resampleWithGapFill(
      graft.core.Tables(spark, sfDir, "events"), "event_type", "ts", "value", 3600L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "resample lost map-side combine")
    assert(plan.contains("Generate"), "expected the in-plan dense spine explode")
  }

  test("salted aggregation's first exchange is keyed by (key, salt)") {
    // the skew mitigation is only real if the FIRST shuffle spreads the
    // hot key: partition expression must include __salt, and the plan must
    // carry two keyed aggregations (partial-per-(k,salt), merge-per-k)
    val exec0 = SparkEntry.queries("q_a_skew_salted")(spark, sfDir)
      .queryExecution.executedPlan
    // AQE wraps the plan in a leaf AdaptiveSparkPlanExec — unwrap so
    // collect() can traverse the real operators
    val exec = exec0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val plan = exec.toString
    val saltedExchanges = plan.split("\n")
      .filter(l => l.contains("hashpartitioning") && l.contains("__salt"))
    assert(saltedExchanges.nonEmpty,
      s"no exchange keyed by the salt:\n${plan.take(1500)}")
    // collect real aggregate operators (hash/sort/objecthash all extend
    // BaseAggregateExec) instead of counting plan-string substrings
    val aggs = exec.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.count(_.groupingExpressions.nonEmpty) >= 4,
      "expected two keyed aggregation stages (each partial+final), got:\n" +
        aggs.map(_.groupingExpressions.map(_.sql)).mkString("\n"))
    val saltKeyed = aggs.filter(
      _.groupingExpressions.exists(_.sql.contains("__salt")))
    assert(saltKeyed.nonEmpty, "no aggregate grouped by the salt")
    // and the naive form must NOT pay the extra stage
    val naive = SparkEntry.queries("q_a_skew_naive")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!naive.contains("__salt"))
  }

  test("chunking is a pure narrow pipeline (no exchange before the explode)") {
    val df = graft.text.TextOps.chunkText(
      graft.core.Tables(spark, sfDir, "documents"), "doc_id", "text", 200, 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "expected a Generate (explode)")
    assert(!plan.contains("Exchange"),
      s"chunking should not shuffle:\n${plan.take(1500)}")
  }
}
