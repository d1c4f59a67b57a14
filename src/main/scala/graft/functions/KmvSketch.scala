package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded buffer of the `k` smallest DISTINCT hash values seen so far —
  * the KMV ("k minimum values" / bottom-k) distinct sketch [Bar-Yossef et
  * al. 2002]. Insertion and merge keep the set size <= k, so the buffer is
  * O(k) no matter how many values flow through it.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && set.add(h)) { set.pollLast(); () }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `kmv_kth(hash, k)` — per-group KMV distinct sketch over a pre-hashed
  * int64 column, as a native Catalyst [[TypedImperativeAggregate]] (the
  * engine's UDAF surface: partial aggregation, map-side combine, and
  * streaming-state storage all come from the aggregate contract, with the
  * buffer serialized as `k` sorted longs).
  *
  * Returns `struct(n_kept INT, kth_hash BIGINT)`: the kept-set size and,
  * once the sketch is full (`n_kept = k`), the k-th smallest distinct hash.
  * Callers derive the cardinality estimate (exact `n_kept` below capacity;
  * `(k-1) * 2^60 / kth_hash` at capacity for a 60-bit hash domain) — kept
  * OUT of the aggregate so the certified surface is pure integer state.
  *
  * Why this sketch alongside linear counting ([[graft.operators.Sketches]]):
  * linear counting's accuracy dies once n approaches its FIXED bucket count
  * m (the sketch saturates); KMV's relative error ~1/sqrt(k-2) is
  * INDEPENDENT of n, so the same 64-entry buffer that counts 10^2 also
  * counts 10^10 — the regime a 100 TB column lives in. Merge is a bounded
  * set-union, so partial aggregation combines map-side like any algebraic
  * agg; per-group state is <= k longs regardless of input size.
  *
  * Reference analogue: the reference engine has no sketches — its distinct
  * counts are exact SQL over MySQL (README.md:236-247); this is part of the
  * mandated scale extension surface.
  */
@ExpressionDescription(
  usage = "_FUNC_(hash, k) - KMV bottom-k distinct sketch over int64 hashes; " +
    "returns struct(n_kept, kth_hash).")
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 2, s"kmv_kth(hash, k): k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_kth requires a BIGINT hash input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth_hash", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val n = buffer.set.size
    val kth: Any = if (n == k) buffer.set.last else null
    new GenericInternalRow(Array[Any](n, kth))
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Column-API form: `agg(KmvSketch.agg(hashCol, k).as("kmv"))`. */
  def agg(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())
}
