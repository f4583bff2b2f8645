package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k buffer: a size-k min-heap over (score, id) where
  * the ROOT is the worst kept element — "worse" = lower score, ties broken
  * toward LARGER id (so the kept set is exactly `ORDER BY score DESC, id
  * ASC LIMIT k`, deterministic under any partitioning / merge order).
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  // e1 worse than e2 under (score DESC, id ASC) ranking
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }
}

/** Per-group top-k as a single aggregate: `top_rows(score, id)` keeps the k
  * best (score DESC, id ASC) pairs per group and returns them best-first as
  * `array<struct<score double, id bigint>>`.
  *
  * Why an aggregate and not a window (preference ladder step (b)): the
  * standard per-group top-n plan — `row_number() OVER (PARTITION BY g ORDER
  * BY score DESC)` then `WHERE rn <= k` — sorts and shuffles EVERY row of
  * the fact table before any can be discarded. This aggregate participates
  * in partial aggregation (ObjectHashAggregate), so each map task reduces
  * its partitions to ≤ k rows PER GROUP before the exchange: at 100 TB the
  * shuffle carries O(groups · k · tasks) heap entries instead of every row,
  * the same per-partition-heaps-then-merge shape TakeOrderedAndProject uses
  * for global top-k, now available per key. Merge order cannot affect the
  * result: the kept set equals the global `ORDER BY ... LIMIT k` by the
  * deterministic total order, so results are partitioning-invariant and
  * DuckDB-oracle-checkable.
  *
  * Null score or id rows are skipped (SQL aggregates ignore nulls), and so
  * are NaN scores — NaN compares false against everything, which would
  * corrupt the heap invariant and the output sort's total order.
  */
case class TopKRows(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_rows k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_rows requires (double, bigint) inputs, got " +
        s"${score.dataType.catalogString} / ${payload.dataType.catalogString}")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null && !s.asInstanceOf[Double].isNaN)
      buf.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val idx = Array.range(0, buf.n).sortWith { (a, b) =>
      buf.scores(a) > buf.scores(b) ||
        (buf.scores(a) == buf.scores(b) && buf.ids(a) < buf.ids(b))
    }
    new GenericArrayData(idx.map(i => new GenericInternalRow(
      Array[Any](buf.scores(i), buf.ids(i))): Any))
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "top_rows"
}

object TopKRows {
  /** Column API: per-group top-k (score DESC, id ASC) as
    * `array<struct<score, id>>`, best first. Numeric inputs are cast to
    * (double, bigint) here — the expression itself is strict. */
  def topRows(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKRows(
      Cast(Bridge.expression(score), DoubleType),
      Cast(Bridge.expression(id), LongType), k).toAggregateExpression())
}
