package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Size-bounded sorted collect of a group's LONG members: every
  * aggregation buffer — map-side partial and final alike — holds at most
  * `cap + 1` elements BY CONSTRUCTION. Once a buffer reaches cap + 1 it
  * stops accumulating: the consumer's size filter (`size(ds) <= cap`)
  * drops the group either way, so which over-cap elements survive is
  * irrelevant, while every group of <= cap members collects in full and
  * sorts exactly like `sort_array(collect_list(...))`.
  *
  * This is the single-shuffle answer to the r7-verdict buffer finding:
  * `collect_list`-then-filter bounds the candidate PAIRS but buffers the
  * whole degenerate bucket first (multi-GB in one buffer at 10^9 docs —
  * executor OOM); a pre-count + anti-join keeps buffers bounded but pays
  * a second pass over the bucket stream (measured +0.2-0.36 s per dedup
  * query at sf0.1). Here the bound lives inside the aggregate, so the
  * plan keeps the original one-shuffle shape with O(cap) buffers.
  */
case class BoundedCollectLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  // cap + 1, saturating: Int.MaxValue means "unbounded" (spec ground-truth
  // runs), and cap + 1 must not overflow to a negative limit
  private def limit = math.min(cap.toLong + 1L, Int.MaxValue.toLong).toInt

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (b1.length < limit && i < b2.length) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLongs =
    copy(child = newChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_longs"
}

object BoundedCollect {
  /** sorted list of the group's ids, buffers bounded at `cap + 1` */
  def boundedCollectLongsCol(c: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectLongs(ColumnBridge.expression(c), cap).toAggregateExpression())
}
