package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions callable from SQL. Wire with
  * `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  * build, or call [[GraftExtensions.register]] on a live session.
  *
  * `float_dot(a, b)` — the codegen'd float-array dot product
  * ([[FloatDotProduct]]); `1 - float_dot(a,b)/...` cosine pipelines can
  * then live entirely in `spark.sql` strings. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("float_cosine"),
      new ExpressionInfo(classOf[FloatCosine].getName, "float_cosine"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "float_cosine takes exactly 2 arguments")
        FloatCosine(args(0), args(1))
      }))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "float_dot", { args =>
      require(args.size == 2, "float_dot takes exactly 2 arguments")
      FloatDotProduct(args(0), args(1))
    })
    Bridge.registerFunction(spark, "float_cosine", { args =>
      require(args.size == 2, "float_cosine takes exactly 2 arguments")
      FloatCosine(args(0), args(1))
    })
  }
}
