package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.meta.Codebook

class MetaBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codebook parses options and compiles cleaning expressions") {
    val codebook = Seq(
      ("age", "numeric", "", 0),
      ("smokes", "category", "1:yes | 2:no | 8:비해당 | 9:모름", 0),
      ("weight_var", "numeric", "", 1)).toDF(
      "variable", "data_type", "option_description", "drop_col")
    val vars = Codebook.fromDataFrame(codebook)
    val smokes = vars.find(_.name == "smokes").get
    assert(smokes.naCodes == Seq(8.0) && smokes.dkCodes == Seq(9.0))
    assert(vars.find(_.name == "weight_var").get.drop)

    val data = Seq((30.0, 1.0, 7.0), (40.0, 8.0, 7.0), (50.0, 9.0, 7.0))
      .toDF("age", "smokes", "weight_var")
    val cleaned = Codebook.applyCleaning(data, vars)
    assert(!cleaned.columns.contains("weight_var"))
    val smokesVals = cleaned.select("smokes").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(smokesVals.toSeq == Seq(Some(1.0), Some(-1.0), None))
    assert(Codebook.categoricalColumns(data, vars) == Seq("smokes"))
  }

  test("bucketed tables join without a shuffle on the bucketed keys") {
    val orders = graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = graft.core.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    // AQE off to read the static plan; broadcast off so the join actually
    // uses the bucket layout (tiny test tables would broadcast otherwise)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must need no Exchange: both sides pre-bucketed
      val joinSection = plan.split("HashAggregate")(plan.split("HashAggregate").length - 1)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
      // one exchange for the final groupBy is fine; the join adds none
      assert(exchanges <= 1, s"bucketed join still shuffles:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
