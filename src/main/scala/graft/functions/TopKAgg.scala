package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded buffer of the `k` rank-first (value DESC, id ASC) pairs seen so
  * far. Insertion and merge keep the set size <= k, so the buffer is O(k)
  * no matter how many rows flow through it.
  */
final class TopKBuffer(val k: Int) {
  // natural order = rank order reversed: first() is the eviction candidate
  // (smallest value, largest id among ties)
  val set = new java.util.TreeSet[Array[Long]](new Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }
  })

  def add(value: Long, id: Long): Unit = {
    val pair = Array(value, id)
    if (set.size < k) { set.add(pair); () }
    else if (set.comparator.compare(pair, set.first) > 0 && set.add(pair)) {
      set.pollFirst(); ()
    }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) { val p = it.next(); add(p(0), p(1)) }
  }
}

/** `top_k_pairs(value, id, k)` — per-group bounded top-k as a native
  * Catalyst [[TypedImperativeAggregate]]: the k rank-first `(value, id)`
  * pairs under `ORDER BY value DESC, id ASC`, returned as an
  * `array<struct<value BIGINT, id BIGINT>>` in rank order.
  *
  * Why an aggregate and not a window: the `row_number() OVER (PARTITION BY
  * g ORDER BY v DESC) <= k` idiom (see
  * [[graft.operators.Relational.windowTop3]]) shuffles and SORTS the whole
  * fact table to discard all but k rows per group. This aggregate does the
  * top-k inside the scan stage: every mapper keeps an O(k) buffer per
  * group (partial aggregation / map-side combine come from the aggregate
  * contract), so the shuffle carries at most `k * mappers` rows per group
  * and nothing is ever globally sorted. At 100 TB that is the difference
  * between shuffling the table and shuffling kilobytes.
  *
  * Exactness: bounded top-k is NOT an approximation — merge-of-top-k is
  * top-k of the union, so the result is byte-identical to the window form
  * regardless of partitioning or merge order. Ties are pinned by the
  * (value DESC, id ASC) total order, which assumes `id` is unique within a
  * group (duplicate (value, id) pairs collapse set-wise).
  *
  * Two documented, spec-pinned divergences from the window idiom
  * (BoundedTopKSpec "NULL rows are ignored…", "duplicate (value, id)
  * pairs collapse…"):
  *   - NULLs: rows with a NULL value OR id are skipped in `update` — the
  *     standard SQL aggregate posture (`SUM`/`MAX` ignore NULLs). The
  *     window form under `ORDER BY v DESC` ranks NULLs LAST, so when a
  *     group has fewer than k non-null rows the window form pads with
  *     NULL-valued rows while this aggregate returns only the non-null
  *     pairs. Pre-filter or COALESCE if NULLs must rank.
  *   - Duplicates: a (value, id) pair arriving twice occupies ONE buffer
  *     slot (the buffer is a set keyed by the total order), so k distinct
  *     pairs are returned where the window form would count the duplicate
  *     toward k. Under the documented uniqueness assumption the two forms
  *     agree; this pin states what happens when the assumption is broken.
  *
  * Reference analogue: the reference reads "top N" with `ORDER BY ... DESC
  * LIMIT N` over MySQL (README.md:236-247) — a single-node sort. This is
  * the distributed form of the same query surface.
  */
@ExpressionDescription(
  usage = "_FUNC_(value, id, k) - bounded exact top-k by (value DESC, id ASC); " +
    "returns array<struct<value, id>> in rank order.")
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 1, s"top_k_pairs(value, id, k): k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs requires BIGINT value and id, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null)
      buffer.add(v.asInstanceOf[Long], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val out = new Array[Any](buffer.set.size)
    val it = buffer.set.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p(0), p(1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** Column-API form: `agg(TopKAgg.agg(valueCol, idCol, k).as("top"))`. */
  def agg(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(value), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
