package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH signature over an `array<float>` vector:
  * bit p = sign(v · plane_p), packed into a long. The plane matrix is the
  * same md5-derived deterministic constant grid as
  * [[graft.sim.Similarity.planeConst]], computed once on the driver and
  * shipped as a reference object — the generated code is one primitive
  * nPlanes × dim mult-add loop.
  *
  * Why an Expression (ladder step (b), the [[NearestCentroid]] precedent):
  * this is the blocking stage of every hyperplane-LSH ANN / embedding
  * near-dup query — it runs once per corpus row. The previous Scala UDF
  * paid the ScalaUDF conversion boundary (boxed Seq[Float] per row) and
  * broke the surrounding WholeStageCodegen span. Results are BIT-IDENTICAL
  * to both the UDF and the interpreted higher-order-function form: same
  * plane constants, same left-to-right double accumulation, same strict
  * `dot > 0` sign test (ExpressionSpec pins the parity).
  *
  * Equality/canonicalization: parameterized by (nPlanes, dim, seed) — all
  * scalars — so structurally equal signatures `semanticEquals`; the
  * double[] grid is derived, never a constructor field.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int, dim: Int,
                               seed: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63], got $nPlanes")
  require(dim >= 1, s"dim must be positive, got $dim")

  @transient private lazy val planes: Array[Double] = {
    val flat = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var d = 0
      while (d < dim) {
        flat(p * dim + d) = graft.sim.Similarity.planeConst(seed, p, d)
        d += 1
      }
      p += 1
    }
    flat
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"HyperplaneSignature requires array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val pl = planes
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * pl(p * dim + i); i += 1 }
      if (dot > 0) sig += (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $sig = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * $pl[$p * $dim + $i];
         |  }
         |  if ($dot > 0) $sig += (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Column API: packed-bits hyperplane signature for a float-array
    * column. */
  def signature(vec: Column, nPlanes: Int, dim: Int, seed: Int): Column =
    Bridge.column(HyperplaneSignature(Bridge.expression(vec), nPlanes, dim, seed))
}
