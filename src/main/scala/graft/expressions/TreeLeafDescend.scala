package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Leaf-node descent of one row through a SET of fitted histogram trees
  * (HistTree / Forest / HistGbtR models), as one tiny catalyst node:
  * returns `array<int>` of the terminal node id reached in each tree.
  *
  * Why an Expression (the NearestCentroid ladder, step (b)): the
  * when/otherwise form of a fitted tree enumerates every root-to-leaf
  * PATH — terminals × depth split conditions, each re-deriving its bin
  * arithmetic — so a 4-tree forest cascade is thousands of catalyst
  * nodes, and every job whose plan contains it pays tree-size traversal
  * costs in EVERY analyzer/optimizer rule (r13 jstack sampling:
  * q_m14_perm_importance spent ~75% of its 5 s inside TreeNode
  * mapChildren/exists/transformDown, with all stages < 50 ms). The
  * fitted tables move into ONE reference object here, the plan shrinks
  * to O(1) nodes per model, and the descent itself is the obvious
  * while-loop.
  *
  * BIT-IDENTICAL semantics to the path-CASE form it replaces:
  *   - bin(f) = cast(greatest(least(floor((x−min)·B / (max−min+1)),
  *     B−1), 0) as int) — same double arithmetic, same NaN behavior
  *     (Spark's least/greatest order NaN largest, so a NaN quotient
  *     clamps to B−1), same truncating int cast;
  *   - descend left iff (bin ≤ splitBin) IS TRUE — a null/missing
  *     feature yields a null bin, which descends RIGHT (the
  *     `<=> lit(true)` discipline of HistTree.pathCond);
  *   - a node absent from the split table is terminal.
  *
  * Leaf-value lookup stays OUTSIDE (a literal-map `element_at`, null =
  * abstain), so this one expression serves plain trees, forest votes,
  * and GBT leaf-sum scoring alike.
  */
case class TreeLeafDescend(child: Expression,
                           trees: IndexedSeq[TreeLeafDescend.Spec])
    extends UnaryExpression {

  require(trees.nonEmpty, "TreeLeafDescend needs at least one tree")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"TreeLeafDescend requires array<double> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val data: TreeLeafDescend.Data =
    TreeLeafDescend.Data(trees)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    new GenericArrayData(TreeLeafDescend.descendAll(data, arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("treeData", data,
      "graft.expressions.TreeLeafDescend.Data")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.TreeLeafDescend.descendAll($d, $a));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TreeLeafDescend {

  /** One fitted tree: its split table (node, feature, bin) plus the
    * shared bin grid (per-feature min/max, bin count). IndexedSeq fields
    * keep case-class equality structural, so two identical descents
    * canonicalize/CSE like any other expression. */
  case class Spec(splits: IndexedSeq[(Int, Int, Int)],
                  mins: IndexedSeq[Long], maxs: IndexedSeq[Long], bins: Int)

  /** Runtime-compact node-indexed tables (feat(node) = −1 marks a
    * terminal; nodes beyond the array are terminal too). */
  final class Data(val feat: Array[Array[Int]], val bin: Array[Array[Int]],
                   val mins: Array[Array[Long]], val maxs: Array[Array[Long]],
                   val nbins: Array[Int]) extends Serializable

  object Data {
    def apply(specs: IndexedSeq[Spec]): Data = {
      val feat = specs.map { s =>
        val n = if (s.splits.isEmpty) 0 else s.splits.map(_._1).max + 1
        val a = Array.fill(n)(-1)
        s.splits.foreach { case (node, f, _) => a(node) = f }
        a
      }.toArray
      val bin = specs.map { s =>
        val n = if (s.splits.isEmpty) 0 else s.splits.map(_._1).max + 1
        val a = new Array[Int](n)
        s.splits.foreach { case (node, _, b) => a(node) = b }
        a
      }.toArray
      new Data(feat, bin, specs.map(_.mins.toArray).toArray,
        specs.map(_.maxs.toArray).toArray, specs.map(_.bins).toArray)
    }
  }

  /** The descent loop, shared by eval and codegen (it is driver-literal
    * model data against one row — nothing here benefits from inlining). */
  def descendAll(d: Data, arr: ArrayData): Array[Int] = {
    val t = d.feat.length
    val out = new Array[Int](t)
    val n = arr.numElements()
    var ti = 0
    while (ti < t) {
      val feat = d.feat(ti); val sbin = d.bin(ti)
      val mn = d.mins(ti); val mx = d.maxs(ti)
      val b = d.nbins(ti)
      var node = 0
      while (node < feat.length && feat(node) >= 0) {
        val f = feat(node)
        var left = false
        if (f < n && !arr.isNullAt(f)) {
          val x = arr.getDouble(f)
          // ((x − min)·B) / (max − min + 1), floored — the exact
          // HistTree.binExprs arithmetic: SQL floor(double) returns
          // BIGINT, so the quotient passes through a double→long cast
          // BEFORE the least/greatest clamp. That cast sends NaN to 0
          // (and ±Inf to Long.Min/Max), so a NaN feature lands in bin 0
          // and descends LEFT — pinned by R13EquivalenceSpec against the
          // path-CASE form (the r13 first cut clamped NaN to B−1, a
          // divergence no catalog data exercised but the spec caught).
          val v = math.floor((x - mn(f).toDouble) * b.toDouble /
            (mx(f) - mn(f) + 1L).toDouble)
          val l = v.toLong
          val bb = if (l > (b - 1).toLong) b - 1
                   else if (l < 0L) 0
                   else l.toInt
          left = bb <= sbin(node)
        }
        node = if (left) 2 * node + 1 else 2 * node + 2
      }
      out(ti) = node
      ti += 1
    }
    out
  }

  /** Column API: per-tree terminal node ids (`array<int>`, one element
    * per spec, in order) for an `array<double>` feature column. */
  def leaves(vec: Column, specs: Seq[Spec]): Column =
    Bridge.column(TreeLeafDescend(Bridge.expression(vec), specs.toIndexedSeq))
}
