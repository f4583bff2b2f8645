package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one place the engine touches a `private[sql]` API: converting a
  * catalyst Expression into a public Column (Spark 4 removed the public
  * constructor when Column became ColumnNode-based). Lives under
  * org.apache.spark.sql.* solely for access; no Spark internals are
  * modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
