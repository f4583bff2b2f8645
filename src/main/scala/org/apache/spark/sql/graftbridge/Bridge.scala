package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one place the engine touches `private[sql]` APIs: converting a
  * catalyst Expression into a public Column (Spark 4 removed the public
  * constructor when Column became ColumnNode-based), and registering a
  * native-Expression SQL function on an already-built session. Lives under
  * org.apache.spark.sql.* solely for access; no Spark internals are
  * modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** RDD ids of the LogicalRDD leaves of a (checkpointed) DataFrame's
    * analyzed plan — the exact pinned ids of a `localCheckpoint` result,
    * read off the frame itself. Replaces getPersistentRDDs set-diff
    * bracketing, which mis-attributed ids when two driver threads
    * checkpointed concurrently (r14: the q_pipe_ep4 overlap unpersisted
    * the other thread's live checkpoint block). */
  def leafRddIds(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet

  /** Temp-function registration on a live session (the extensions route in
    * graft.expressions.GraftExtensions covers sessions built with
    * spark.sql.extensions). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
