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

  /** Temp-function registration on a live session (the extensions route in
    * graft.expressions.GraftExtensions covers sessions built with
    * spark.sql.extensions). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
