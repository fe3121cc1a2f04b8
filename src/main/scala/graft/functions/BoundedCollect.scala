package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
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

/** Exact deterministic top-k per group: keeps the k (key, id) pairs with
  * the SMALLEST (key asc, id asc) rank, with every buffer — map-side
  * partial and reduce-side final — holding at most k elements BY
  * CONSTRUCTION. This is per-group TakeOrdered: a billion-row stratum
  * costs one partial-agg shuffle of ≤ k rows per (partition, group),
  * where the window-function spelling (`row_number() OVER (PARTITION BY
  * stratum ORDER BY key)`) sorts every stratum end-to-end just to keep
  * k rows. Result is the ids of the k best pairs (order unspecified —
  * callers sort).
  *
  * The key is compared as a java String (the callers rank by md5 hex —
  * ASCII, so JVM, UTF8String-binary, and DuckDB collation all agree).
  */
case class BoundedTopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(String, Long)]] with BinaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[(String, Long)] =
    new ArrayBuffer[(String, Long)]

  /** true iff a ranks strictly after b in (key asc, id asc) order */
  private def worse(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c > 0 || (c == 0 && a._2 > b._2)
  }

  private def add(buf: ArrayBuffer[(String, Long)], e: (String, Long)): Unit = {
    if (buf.length < k) buf += e
    else if (k > 0) {
      var wi = 0
      var i = 1
      while (i < buf.length) { if (worse(buf(i), buf(wi))) wi = i; i += 1 }
      if (worse(buf(wi), e)) buf(wi) = e
    }
  }

  override def update(buf: ArrayBuffer[(String, Long)], input: InternalRow): ArrayBuffer[(String, Long)] = {
    val kv = left.eval(input)
    val iv = right.eval(input)
    // toString materializes the key out of the reusable UnsafeRow buffer
    if (kv != null && iv != null) add(buf, (kv.toString, iv.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: ArrayBuffer[(String, Long)], b2: ArrayBuffer[(String, Long)]): ArrayBuffer[(String, Long)] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(String, Long)]): Any =
    new GenericArrayData(buf.map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(String, Long)]): Array[Byte] = {
    val parts = buf.map { case (s, id) => (s.getBytes("UTF-8"), id) }
    val bb = ByteBuffer.allocate(4 + parts.map(12 + _._1.length).sum)
    bb.putInt(parts.length)
    parts.foreach { case (sb, id) => bb.putInt(sb.length); bb.put(sb); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(String, Long)](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf += ((new String(sb, "UTF-8"), bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_top_k"
}

/** [[BoundedTopK]] with a STRING payload: keeps the k (key, payload)
  * pairs with the smallest (key asc, payload asc) rank and returns the
  * payloads (order unspecified — callers sort or rank downstream).
  * Same bounded-buffer contract: map-side partials and the reduce-side
  * final buffer never exceed k elements, so a vocabulary-sized group
  * (top-k n-grams per language over a 10^8-term vocabulary) costs one
  * partial-agg shuffle of ≤ k rows per (partition, group) instead of the
  * per-group end-to-end sort a `row_number()` window would plan.
  *
  * Keys are compared as java Strings — callers build ASCII-sortable
  * keys (zero-padded counts, hex digests) so JVM order, UTF8String
  * binary order, and DuckDB collation agree.
  */
case class BoundedTopKStrings(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(String, String)]] with BinaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[(String, String)] =
    new ArrayBuffer[(String, String)]

  /** true iff a ranks strictly after b in (key asc, payload asc) order */
  private def worse(a: (String, String), b: (String, String)): Boolean = {
    val c = a._1.compareTo(b._1)
    c > 0 || (c == 0 && a._2.compareTo(b._2) > 0)
  }

  private def add(buf: ArrayBuffer[(String, String)], e: (String, String)): Unit = {
    if (buf.length < k) buf += e
    else if (k > 0) {
      var wi = 0
      var i = 1
      while (i < buf.length) { if (worse(buf(i), buf(wi))) wi = i; i += 1 }
      if (worse(buf(wi), e)) buf(wi) = e
    }
  }

  override def update(buf: ArrayBuffer[(String, String)], input: InternalRow): ArrayBuffer[(String, String)] = {
    val kv = left.eval(input)
    val pv = right.eval(input)
    if (kv != null && pv != null) add(buf, (kv.toString, pv.toString))
    buf
  }

  override def merge(b1: ArrayBuffer[(String, String)], b2: ArrayBuffer[(String, String)]): ArrayBuffer[(String, String)] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(String, String)]): Any =
    new GenericArrayData(buf.map(p => org.apache.spark.unsafe.types.UTF8String.fromString(p._2)).toArray)

  override def serialize(buf: ArrayBuffer[(String, String)]): Array[Byte] = {
    val parts = buf.map { case (s, p) => (s.getBytes("UTF-8"), p.getBytes("UTF-8")) }
    val bb = ByteBuffer.allocate(4 + parts.map(p => 8 + p._1.length + p._2.length).sum)
    bb.putInt(parts.length)
    parts.foreach { case (sb, pb) =>
      bb.putInt(sb.length); bb.put(sb); bb.putInt(pb.length); bb.put(pb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(String, String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(String, String)](n)
    var i = 0
    while (i < n) {
      val klen = bb.getInt
      val kb = new Array[Byte](klen)
      bb.get(kb)
      val plen = bb.getInt
      val pb = new Array[Byte](plen)
      bb.get(pb)
      buf += ((new String(kb, "UTF-8"), new String(pb, "UTF-8")))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopKStrings =
    copy(left = newLeft, right = newRight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bounded_top_k_strings"
}

object BoundedCollect {
  /** sorted list of the group's ids, buffers bounded at `cap + 1` */
  def boundedCollectLongsCol(c: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectLongs(ColumnBridge.expression(c), cap).toAggregateExpression())

  /** ids of the group's k smallest (key, id) pairs, buffers ≤ k */
  def boundedTopKCol(key: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(key), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** payloads of the group's k smallest (key, payload) pairs, buffers ≤ k */
  def boundedTopKStringsCol(key: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopKStrings(ColumnBridge.expression(key), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}
