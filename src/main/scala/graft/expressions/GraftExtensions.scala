package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions callable from SQL and installs the optimizer rules. Wire
  * with `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  * build, or call [[GraftExtensions.register]] on a live session.
  *
  * `float_dot(a, b)` — the codegen'd float-array dot product
  * ([[FloatDotProduct]]); `float_cosine(a, b)` — the fused cosine;
  * `top_rows(score, id, k)` — per-group bounded top-k aggregate
  * ([[TopKRows]]); [[CosineFuseRule]] — rewrites composed dot/norm cosine
  * into the fused form. */
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
    ext.injectFunction((
      FunctionIdentifier("top_rows"),
      new ExpressionInfo(classOf[TopKRows].getName, "top_rows"),
      GraftExtensions.topRowsBuilder))
    ext.injectOptimizerRule(_ => CosineFuseRule)
  }
}

object GraftExtensions {

  private[expressions] val topRowsBuilder: Seq[Expression] => Expression = {
    args =>
      require(args.size == 3, "top_rows takes (score, id, k)")
      val k = args(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"top_rows k must be an integer literal, got $other")
      }
      TopKRows(Cast(args(0), DoubleType), Cast(args(1), LongType), k)
  }

  /** Register the same functions + optimizer rule on an already-built
    * session (extraOptimizations is the live-session route for rules). */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "float_dot", { args =>
      require(args.size == 2, "float_dot takes exactly 2 arguments")
      FloatDotProduct(args(0), args(1))
    })
    Bridge.registerFunction(spark, "float_cosine", { args =>
      require(args.size == 2, "float_cosine takes exactly 2 arguments")
      FloatCosine(args(0), args(1))
    })
    Bridge.registerFunction(spark, "top_rows", topRowsBuilder)
    if (!spark.experimental.extraOptimizations.contains(CosineFuseRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosineFuseRule
  }
}
