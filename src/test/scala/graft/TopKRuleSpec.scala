package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import graft.expressions.{CosineFuseRule, FloatCosine, FloatDotProduct, GraftExtensions, TopKRows}

/** Round-6 Catalyst surface: the bounded-heap per-group top-k aggregate
  * and the composed-cosine fusion optimizer rule. */
class TopKRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ordersTop3(sfDir: String) =
    graft.core.Tables(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(TopKRows.topRows(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
        col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))

  test("top_rows matches the window row_number plan exactly") {
    val sfDir = "/root/testdata/sf0.01"
    val viaAgg = ordersTop3(sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = graft.core.Tables(spark, sfDir, "orders")
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("top_rows is partitioning-invariant and merges partial heaps") {
    val base = (1 to 997).map(i => (i % 7, (i * 31 % 101).toDouble, i.toLong))
      .toDF("g", "score", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(TopKRows.topRows(col("score"), col("id"), 5).as("top"))
        .select(col("g"), col("top"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Any](1).toList).toMap
    val a = run(base.repartition(1))
    val b = run(base.repartition(13, col("id")))
    assert(a == b && a.size == 7)
    // duplicate scores break toward the SMALLER id (score DESC, id ASC)
    val ties = Seq((1, 5.0, 10L), (1, 5.0, 2L), (1, 5.0, 7L), (1, 1.0, 1L))
      .toDF("g", "score", "id")
      .groupBy("g").agg(TopKRows.topRows(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top"))).select(col("col.id"))
      .collect().map(_.getLong(0)).toList
    assert(ties == List(2L, 7L))
  }

  test("top_rows aggregates with map-side partials (ObjectHashAggregate)") {
    val df = graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
      .groupBy("o_orderpriority")
      .agg(TopKRows.topRows(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    // partial + final phases: each map task reduces to ≤ k rows per group
    // BEFORE the exchange — the property that shrinks the shuffle at scale
    assert(aggs.size == 2,
      s"expected partial+final ObjectHashAggregate, got:\n${df.queryExecution.executedPlan}")
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode.toString)).toSet
    assert(modes == Set("Partial", "Final"), s"modes were $modes")
  }

  test("ANN top-k ranks through the partial-aggregating heap, not a window") {
    // q_v_knn_brute's plan (Similarity/exactCosineTopK route every ANN
    // ranking through TopKRows): partial+final ObjectHashAggregate present,
    // no Window operator anywhere — each map task emits ≤ k candidates per
    // query before the exchange instead of sorting every scored pair.
    val df = SparkEntry.queries("q_v_knn_brute")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def collectAll[T](f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T],
                      p: org.apache.spark.sql.execution.SparkPlan): Seq[T] =
      p.collect(f) ++ p.subqueries.flatMap(collectAll(f, _))
    val aggModes = collectAll(
      { case a: ObjectHashAggregateExec => a }, plan)
      .flatMap(_.aggregateExpressions
        .filter(_.aggregateFunction.isInstanceOf[TopKRows]).map(_.mode.toString))
    assert(aggModes.contains("Partial") && aggModes.contains("Final"),
      s"expected partial+final TopKRows aggregation, got modes $aggModes in:\n$plan")
    val windows = collectAll(
      { case w: org.apache.spark.sql.execution.window.WindowExec => w }, plan)
    assert(windows.isEmpty, s"ANN ranking must not use a window plan:\n$plan")
  }

  test("topNPerGroupAgg carries full payloads and matches the window plan") {
    val sfDir = "/root/testdata/sf0.01"
    val orders = graft.core.Tables(spark, sfDir, "orders")
    val viaAgg = graft.ops.Ranking.topNPerGroupAgg(orders,
      Seq("o_orderpriority", "o_orderstatus"), "o_totalprice", "o_orderkey", 2)
      .select("o_orderpriority", "o_orderstatus", "rnk", "o_orderkey", "o_custkey")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority", "o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select("o_orderpriority", "o_orderstatus", "rnk", "o_orderkey", "o_custkey")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("top_rows handles groups smaller than k and k = 1") {
    val tiny = Seq((1, 9.0, 1L), (1, 7.0, 2L), (2, 5.0, 3L))
      .toDF("g", "score", "id")
    val r = tiny.groupBy("g")
      .agg(TopKRows.topRows(col("score"), col("id"), 5).as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1).size).toMap
    assert(r == Map(1 -> 2, 2 -> 1)) // short groups return what they have
    val top1 = tiny.groupBy("g")
      .agg(TopKRows.topRows(col("score"), col("id"), 1).as("top"))
      .select(explode(col("top"))).select(col("col.id"))
      .collect().map(_.getLong(0)).toSet
    assert(top1 == Set(1L, 3L))
  }

  test("the heap aggregate is not slower than the window top-n plan") {
    val orders = graft.core.Tables(spark, "/root/testdata/sf0.1", "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice").cache()
    orders.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def windowRun() = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).count()
    def aggRun() = orders.groupBy("o_orderpriority")
      .agg(TopKRows.topRows(col("o_totalprice"), col("o_orderkey"), 3).as("t"))
      .select(explode(col("t"))).count()
    windowRun(); aggRun() // warm both paths
    val tw = (1 to 5).map(_ => time(windowRun())).min
    val ta = (1 to 5).map(_ => time(aggRun())).min
    info(f"window: $tw%.3f s, heap aggregate: $ta%.3f s (x${tw / ta}%.1f)")
    // the window plan shuffles + sorts all 1.5 M rows; the aggregate
    // shuffles ≤ k·groups·tasks heap entries. Allow generous JIT slack.
    assert(ta <= tw * 1.5, f"heap agg $ta%.3f s vs window $tw%.3f s")
    orders.unpersist()
  }

  test("top_rows is callable from SQL and rejects a non-literal k") {
    GraftExtensions.register(spark)
    graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
      .createOrReplaceTempView("orders_topk_sql")
    val viaSql = spark.sql(
      """SELECT o_orderpriority, explode(top_rows(o_totalprice, o_orderkey, 3)) AS e
        |FROM (SELECT * FROM orders_topk_sql) GROUP BY o_orderpriority""".stripMargin)
      .select(col("o_orderpriority"), col("e.id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val viaCol = graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
      .groupBy("o_orderpriority")
      .agg(TopKRows.topRows(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), explode(col("top")))
      .select(col("o_orderpriority"), col("col.id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
    intercept[Exception] {
      spark.sql("SELECT top_rows(o_totalprice, o_orderkey, o_orderkey) FROM orders_topk_sql")
        .collect()
    }
  }

  test("the extensions class applies cleanly to a fresh SparkSessionExtensions") {
    // the injected behavior itself is covered by the SQL-path tests via
    // GraftExtensions.register; this pins that the spark.sql.extensions
    // entry point (reflective no-arg construction + apply) stays valid
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    classOf[GraftExtensions].getDeclaredConstructor().newInstance()(ext)
  }

  test("CosineFuseRule rewrites the composed dot/norm form to FloatCosine") {
    GraftExtensions.register(spark)
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("b")),
        Seq("vec_id"))
    val composed = pairs.select(col("vec_id"),
      (FloatDotProduct.dot(col("a"), col("b")) /
        (sqrt(FloatDotProduct.dot(col("a"), col("a"))) *
          sqrt(FloatDotProduct.dot(col("b"), col("b"))))).as("cos"))
    val optimized = composed.queryExecution.optimizedPlan
    val allExprs = optimized.collect { case n => n.expressions }.flatten
    val fused = allExprs.flatMap(_.collect { case c: FloatCosine => c })
    assert(fused.nonEmpty, s"expected FloatCosine in:\n$optimized")
    val dots = allExprs.flatMap(_.collect { case d: FloatDotProduct => d })
    assert(dots.isEmpty, "all three dot products should fuse away")
    // and the rewritten plan is bit-identical to the direct fused form
    val direct = pairs.select(col("vec_id"),
      graft.sim.Similarity.cosine(col("a"), col("b")).as("cos"))
    val lhs = composed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rhs = direct.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lhs == rhs && lhs.nonEmpty)
  }

  test("CosineFuseRule leaves non-matching norms alone") {
    GraftExtensions.register(spark)
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(10)
    // norm of a THIRD vector (a vs a, b vs b mismatch) must not fuse
    val df = e.select(
      (FloatDotProduct.dot(col("embedding"), col("embedding")) /
        (sqrt(FloatDotProduct.dot(col("embedding"), col("embedding"))) *
          sqrt(lit(1.0)))).as("not_cosine"))
    val fused = df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case c: FloatCosine => c })
    assert(fused.isEmpty)
    assert(CosineFuseRule != null)
  }
}
