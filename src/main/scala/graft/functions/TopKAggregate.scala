package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** Bounded-heap exact top-k aggregate — the r18 replacement for the
  * two-window [[graft.operators.Similarity.twoStageTopK]] physical shape.
  *
  * The window form is exact but pays for generality: stage 1 is an
  * Exchange of EVERY scored row by (key, partition-id) plus a full sort
  * per partition, stage 2 a second exchange + sort of the survivors. The
  * scored volume at the suite's retrieval shapes is millions of rows per
  * battery (bm25Batch at sf0.1: 4.9M (query, doc) groups), and none of
  * those rows past the k-th of each query are needed. This aggregate
  * keeps the per-(key) top k in a bounded binary heap INSIDE the
  * aggregation operator: partial mode runs map-side (no shuffle of the
  * scored rows at all), the exchange carries ≤ k rows per (partition,
  * key), and the final merge folds heaps. No sort of the scored volume
  * ever happens — eval() sorts k survivors.
  *
  * Ordering contract (shared by every retrieval tail in the engine):
  * `(score DESC NULLS LAST, id ASC NULLS FIRST)` — exactly the
  * `Seq(col(score).desc, col(id).asc)` window order it replaces, with
  * Spark's SQL semantics for NaN (largest double, equal to itself) via
  * [[TypeUtils.getInterpretedOrdering]]. The result rows and their ranks
  * are therefore BIT-IDENTICAL to the window form's: (score, id) is a
  * strict total order per group (id is unique within a key by every
  * caller's contract), so top-k membership and order admit exactly one
  * answer.
  *
  * `child` must be a struct of (score: double, id: any orderable type,
  * payload: struct of the carried columns). eval() returns the heap's
  * contents best-first as `array<struct<...>>`; callers posexplode and
  * take `pos + 1` as the rank.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKRows.Buffer] {
  require(k >= 1, s"TopKRows: k must be >= 1, got $k")

  // lazy: the child is unresolved at construction (dataType undefined
  // until analysis binds the attributes)
  @transient private lazy val childStruct: StructType = {
    val st = child.dataType.asInstanceOf[StructType]
    require(st.length == 3 && st.head.dataType == DoubleType,
      s"TopKRows: child must be struct(score double, id, payload), got $st")
    st
  }

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(childStruct(1).dataType)
  @transient private lazy val idType: DataType = childStruct(1).dataType

  /** Best-first total order: score desc nulls last, id asc nulls first. */
  @transient private lazy val bestFirst: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val an = a.isNullAt(0); val bn = b.isNullAt(0)
        val c =
          if (an && bn) 0
          else if (an) 1 // null score = worst (desc nulls last)
          else if (bn) -1
          else java.lang.Double.compare(b.getDouble(0), a.getDouble(0))
        if (c != 0) c
        else {
          val ai = a.isNullAt(1); val bi = b.isNullAt(1)
          if (ai && bi) 0
          else if (ai) -1 // null id first (asc nulls first)
          else if (bi) 1
          else idOrdering.compare(a.get(1, idType), b.get(1, idType))
        }
      }
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): TopKRows.Buffer =
    // initial capacity is capped: the queue grows on demand, and a
    // million-row k (NgramLm's capped pulls ride this aggregate since
    // r19) must not pre-allocate k slots per buffer when most groups
    // hold far fewer rows. Worst-first heap: peek() = eviction candidate
    new TopKRows.Buffer(new java.util.PriorityQueue[InternalRow](
      math.min(k, 64), bestFirst.reversed()))

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val q = buf.q
      // deep-copy on ACCEPT only: project(row) rewrites the struct into
      // the projection's reused buffer, .copy() snapshots it at exact
      // size. A shallow row.copy() is NOT enough — eval'd strings/arrays
      // alias the operator's reused input buffer and would be clobbered
      // by later rows (observed: every heap entry decayed to the last
      // input row when the struct happened to byte-match the buffer).
      if (q.size() < k) q.offer(project(row).copy())
      else if (bestFirst.compare(row, q.peek()) < 0) {
        q.poll(); q.offer(project(row).copy())
      }
    }
    buf
  }

  override def merge(buf: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    val q = buf.q
    val it = other.q.iterator()
    while (it.hasNext) {
      val row = it.next() // already a private copy of the other buffer
      if (q.size() < k) q.offer(row)
      else if (bestFirst.compare(row, q.peek()) < 0) { q.poll(); q.offer(row) }
    }
    buf
  }

  override def eval(buf: TopKRows.Buffer): Any = {
    val arr = buf.q.toArray(new Array[InternalRow](buf.q.size()))
    java.util.Arrays.sort(arr, bestFirst)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val project = UnsafeProjection.create(childStruct)

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = {
    // heap rows are exact-size private UnsafeRows by construction
    // (update projects+copies, deserialize allocates per row)
    val rows = buf.q.toArray(new Array[InternalRow](buf.q.size()))
    val bytes = rows.map(_.asInstanceOf[UnsafeRow].getBytes)
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 4).sum)
    bb.putInt(rows.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = new java.util.PriorityQueue[InternalRow](math.max(1, n), bestFirst.reversed())
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val row = new UnsafeRow(childStruct.length)
      row.pointTo(b, len)
      q.offer(row)
      i += 1
    }
    new TopKRows.Buffer(q)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
}

object TopKRows {
  /** Wrapper keeps the queue type opaque to Spark's buffer handling. */
  final class Buffer(val q: java.util.PriorityQueue[InternalRow])
}
