package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid assignment over an integer-quantized vector:
  * returns the 1-based id of the centroid (row-major `flat`, k × dims
  * longs) with the minimum exact squared L2 distance, ties toward the
  * LOWER id — the same total order as the composable
  * `array_min(struct(dist, cid))` form it replaces in
  * [[graft.ml.KMeans]].
  *
  * Why an Expression (ladder step (b)): the composed form evaluates k
  * interpreted `aggregate(zip_with(...))` lambdas per row — boxed closure
  * calls on the assignment hot path of k-means, SemDeDup blocking, and
  * all 8 product-quantization subspace fits. This generates one primitive
  * double loop (k × dims mult-adds on exact longs), bit-identical by
  * construction since every quantity is integer.
  *
  * Centroids ship as a driver literal (`addReferenceObj`), the same
  * pattern as the LSH plane matrices. Distances fit a long: grid values
  * |q| ≤ ~1e7 → per-term (2e7)² ≈ 4e14, × dims ≪ 2⁶³.
  *
  * `flat` is an IndexedSeq (NOT an Array): case-class equals/hashCode over
  * an Array field would be reference equality, so two structurally equal
  * NearestCentroid expressions would never `semanticEquals` — defeating
  * canonicalization and common-subexpression elimination. The primitive
  * long[] the loops need is materialized once, lazily.
  */
case class NearestCentroid(child: Expression, flat: IndexedSeq[Long], dims: Int)
    extends UnaryExpression {

  require(dims > 0 && flat.nonEmpty && flat.length % dims == 0,
    s"centroid matrix length ${flat.length} must be a positive multiple of dims=$dims")
  private def k: Int = flat.length / dims
  @transient private lazy val flatArr: Array[Long] = flat.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroid requires array<bigint> input, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val n = math.min(dims, q.numElements())
    var best = 0
    var bestDist = Long.MaxValue
    val cents = flatArr
    var c = 0
    while (c < k) {
      var dist = 0L
      var d = 0
      while (d < n) {
        val diff = q.getLong(d) - cents(c * dims + d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", flatArr, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |int $best = 0;
         |long $bestDist = java.lang.Long.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  long $dist = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $diff = $a.getLong($d) - $cents[$c * $dims + $d];
         |    $dist += $diff * $diff;
         |  }
         |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |}
         |${ev.value} = $best + 1;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column API: 1-based nearest-centroid id for a quantized long-array
    * column against a row-major (k × dims) centroid matrix. */
  def assign(vec: Column, centroids: Seq[Seq[Long]]): Column = {
    val dims = centroids.head.size
    require(centroids.forall(_.size == dims), "ragged centroid matrix")
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      centroids.flatten.toIndexedSeq, dims))
  }
}
