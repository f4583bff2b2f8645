package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Fused codegen'd cosine similarity over two `array<float>` columns.
  *
  * `dot/(sqrt(na)*sqrt(nb))` via three [[FloatDotProduct]] calls traverses
  * both arrays three times per pair — and on a candidate join the norms are
  * recomputed for every pair the vector appears in. This expression runs
  * ONE primitive loop accumulating all three sums, then divides exactly as
  * the composed form does (`dot / (sqrt(na) * sqrt(nb))`), so results are
  * bit-for-bit identical to `FloatDotProduct`-composed cosine on every
  * non-degenerate input — every oracle written against that form verifies
  * this one (ExpressionSpec).
  *
  * Zero-norm inputs mirror Spark's `Divide` exactly (raw Java division
  * would return NaN, which sorts as the LARGEST double — a zero vector
  * would silently take rank 1 in every cosine-DESC top-k): when
  * `sqrt(na)*sqrt(nb) == 0` the result is NULL in legacy mode and a
  * divide-by-zero ArithmeticException under ANSI (`failOnError`, captured
  * from the session conf at construction, as Spark's own arithmetic
  * expressions do). This keeps the [[CosineFuseRule]] rewrite
  * semantics-preserving on ALL inputs.
  */
case class FloatCosine(left: Expression, right: Expression,
                       failOnError: Boolean = SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatCosine requires array<float> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    !failOnError || left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (failOnError) throw FloatCosine.divideByZero() else null
    } else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val onZero =
        if (failOnError) "throw graft.expressions.FloatCosine.divideByZero();"
        else s"${ev.isNull} = true;"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) {
         |  $onZero
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatCosine {
  /** Column API: fused codegen'd cosine for float-array columns. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(FloatCosine(Bridge.expression(a), Bridge.expression(b)))

  /** The ANSI-mode zero-norm error (called from generated code). */
  def divideByZero(): ArithmeticException =
    new ArithmeticException(
      "[DIVIDE_BY_ZERO] float_cosine of a zero-norm vector. " +
        "Use try_divide-style guards or disable ANSI mode to get NULL.")
}
