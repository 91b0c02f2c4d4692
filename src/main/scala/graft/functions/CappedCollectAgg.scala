package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` with a hard per-group element cap — the skew-safe
  * collector for inverted-index group-then-combine pair generation
  * ([[graft.pipeline.Winnowing.pairs]]).
  *
  * The pair generators cap group fanout at a document frequency `c`:
  * groups above the cap are boilerplate and get DROPPED, so their
  * members' identities are never needed — only the fact that the group
  * is over the cap. A plain `collect_list` would still buffer every
  * member of the hottest group before the filter discards it (the
  * one-giant-key OOM this cap exists to prevent); this aggregate stops
  * appending at `cap` elements (callers pass `c + 1`), making the
  * buffer O(cap) under ANY skew while staying exact for every group
  * that survives the filter:
  *
  *   - `size(result) <= c`  ⇔ the group's true cardinality is its size,
  *     and the result holds every member;
  *   - `size(result) == c + 1` ⇔ the group is over the cap (truncated —
  *     callers filter these out).
  *
  * Merge truncates the concatenation at the cap, so the invariant
  * survives any partial-aggregation merge tree. Element order is
  * partition-dependent (like `collect_list`); callers must not depend
  * on it.
  */
case class CappedCollectLongAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  require(cap >= 1, "capped_collect needs cap >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buf.size < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      a: mutable.ArrayBuffer[Long],
      b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val room = cap - a.size
    if (room >= b.size) a ++= b
    else if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CappedCollectLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CappedCollectLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectLongAgg =
    copy(child = newChildren.head)
}
