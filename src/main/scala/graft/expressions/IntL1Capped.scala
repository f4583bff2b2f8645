package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd capped L1 distance over two `array<int>` columns: returns
  * Σ|aᵢ−bᵢ|, abandoning the loop as soon as the partial sum exceeds
  * `cap` (any value > cap means "pruned" to a `<= cap` filter, so the
  * exact excess is irrelevant). This is the candidate-prefilter kernel for
  * [[graft.text.TextOps.editNearDupPairs]]: character-histogram L1 / 2 is
  * a provable lower bound on edit distance, so `l1 <= 2·maxDist` keeps
  * every true near-dup while pruning random-corpus pairs in O(alphabet)
  * primitive ops — no per-pair allocation, unlike the zip_with/aggregate
  * HOF form, which is interpreted and boxes every element (measured: the
  * HOF filter cost MORE than the thresholded levenshtein it was saving).
  * Mismatched lengths count the missing tail as all-absent (|x| each) so
  * the bound stays valid for any caller. Null ELEMENTS are treated as 0
  * (same as absent) — the input type may carry containsNull=true from
  * builders like `array(length(...) - ...)` whose children are nullable
  * even when no null is ever produced, so rejecting the type would break
  * valid callers; counting null as "no occurrences" keeps the lower
  * bound conservative.
  */
case class IntL1Capped(left: Expression, right: Expression, cap: Long)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"IntL1Capped requires array<int> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.max(nx, ny)
    var acc = 0L
    var i = 0
    while (i < n && acc <= cap) {
      val xv = if (i < nx && !x.isNullAt(i)) x.getInt(i).toLong else 0L
      val yv = if (i < ny && !y.isNullAt(i)) y.getInt(i).toLong else 0L
      acc += math.abs(xv - yv)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n && $acc <= ${cap}L; $i++) {
         |  long $xv = ($i < $nx && !$a.isNullAt($i)) ? (long) $a.getInt($i) : 0L;
         |  long $yv = ($i < $ny && !$b.isNullAt($i)) ? (long) $b.getInt($i) : 0L;
         |  $acc += java.lang.Math.abs($xv - $yv);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntL1Capped {
  /** Column API: Σ|aᵢ−bᵢ| with early abandon past `cap` (result is only
    * guaranteed exact while ≤ cap — use under a `<= cap` filter). */
  def l1Capped(a: Column, b: Column, cap: Long): Column =
    Bridge.column(IntL1Capped(Bridge.expression(a), Bridge.expression(b), cap))
}
