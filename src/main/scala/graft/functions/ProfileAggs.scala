package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Profiling aggregates the reference exposes through DuckDB
  * (ducklakexl.py:394 passes the SQL through): `histogram` (value ->
  * count MAP, keys ascending), `entropy` (Shannon, log2, counting NULLs
  * out), `mad` (median absolute deviation, interpolated median both
  * passes), `product`. Each is a native TypedImperativeAggregate —
  * map-side partials combine, so the shuffle carries one bounded buffer
  * per (partition, group), not the rows.
  *
  * Scale posture: histogram/entropy buffers are BOUNDED by a distinct-key
  * cap and fail LOUDLY past it (the repo's cap rule — silent truncation
  * would misreport a distribution); `mad` buffers the group's values like
  * Spark's own exact `percentile`/`median` (DuckDB materializes the same
  * way — an exact two-level median has no streaming form).
  */
private[graft] object ProfileAggs {
  /** distinct-key cap for histogram/entropy buffers: far above any
    * profiling use, far below executor memory */
  val MaxDistinctKeys = 1 << 20
}

/** Shared bounded value->count machinery for histogram/entropy. Keys are
  * the child's ATOMIC values (UTF8String/boxed primitives — stable
  * equals/hashCode); rows with NULL keys are not counted (DuckDB skips
  * them in both functions).
  */
abstract class CountMapAggBase
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] with UnaryLike[Expression] {

  def child: Expression
  protected def keyType: DataType = child.dataType

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  private def bump(buf: mutable.HashMap[Any, Long], k: Any, n: Long): Unit = {
    if (!buf.contains(k) && buf.size >= ProfileAggs.MaxDistinctKeys)
      throw new IllegalStateException(
        s"$prettyName: more than ${ProfileAggs.MaxDistinctKeys} distinct keys " +
        "in one group — this aggregate profiles distributions, not " +
        "unique-valued columns (count DISTINCT instead)")
    buf.update(k, buf.getOrElse(k, 0L) + n)
  }

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    // copy: UTF8String/array evals may point into a reused row buffer
    if (v != null) bump(buf, InternalRow.copyValue(v), 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, n) => bump(b1, k, n) }
    b1
  }

  // (keys[], counts[]) through an UnsafeProjection: one serializer for
  // every atomic key type, the same trick Spark's Collect uses
  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](ArrayType(keyType), ArrayType(LongType)))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val ks = new Array[Any](buf.size)
    val vs = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, n) => ks(i) = k; vs(i) = n; i += 1 }
    val row = ser(InternalRow(new GenericArrayData(ks), new GenericArrayData(vs)))
    row.getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val ks = row.getArray(0).toObjectArray(keyType)
    val vs = row.getArray(1).toLongArray()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < ks.length) {
      buf.update(InternalRow.copyValue(ks(i)), vs(i))
      i += 1
    }
    buf
  }

  override def nullable: Boolean = true
}

/** DuckDB `histogram(x)`: MAP(x-type, BIGINT count), keys ascending,
  * NULL keys skipped, empty/all-NULL group -> NULL map. */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountMapAggBase {

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val entries = buf.toArray.sortWith((a, b) => ord.lt(a._1, b._1))
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2).map(Long.box(_): Any)))
  }

  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
  override def prettyName: String = "histogram"
}

/** DuckDB `entropy(x)`: Shannon entropy in bits over the value counts;
  * NULLs don't count, an empty/all-NULL group is 0.0 (measured). */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountMapAggBase {

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val n = buf.valuesIterator.sum.toDouble
    if (n == 0d) return 0d
    var h = 0d
    buf.valuesIterator.foreach { c =>
      val p = c / n
      h -= p * math.log(p)
    }
    h / math.log(2d)
  }

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def withNewMutableAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): EntropyAgg =
    copy(child = newChild)
  override def prettyName: String = "entropy"
}

/** DuckDB `mad(x)`: median(|x - median(x)|), INTERPOLATED median on both
  * passes (mad of {1,2} = 0.5 — measured). DOUBLE in/out for
  * double/integral inputs; for DECIMAL inputs (r12 aggregate
  * differential) the whole pipeline runs in EXACT BigDecimal arithmetic
  * and the result truncates DOWN to the input scale (mad of
  * {1.1, 2.2, 3.0, 9.9} = 0.95 exact -> 0.9 at scale 1 — measured),
  * returning the input DECIMAL type like DuckDB. Buffers the group's
  * values like Spark's exact percentile — an exact two-level median has
  * no streaming form.
  */
case class MadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MadAgg.Buf] with UnaryLike[Expression] {

  private lazy val dec = child.dataType.isInstanceOf[DecimalType]

  override def createAggregationBuffer(): MadAgg.Buf =
    MadAgg.Buf(mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)

  override def update(buf: MadAgg.Buf, input: InternalRow): MadAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      if (dec) buf.bigs += v.asInstanceOf[Decimal].toJavaBigDecimal
      else buf.ds += v.asInstanceOf[Number].doubleValue()
    }
    buf
  }

  override def merge(b1: MadAgg.Buf, b2: MadAgg.Buf): MadAgg.Buf = {
    b1.ds ++= b2.ds; b1.bigs ++= b2.bigs
    b1
  }

  private def medianOfSorted(a: Array[Double]): Double = {
    val n = a.length
    if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2d
  }
  private def medianOfSortedBig(a: Array[java.math.BigDecimal]): java.math.BigDecimal = {
    val n = a.length
    if (n % 2 == 1) a(n / 2)
    else a(n / 2 - 1).add(a(n / 2))
      .divide(java.math.BigDecimal.valueOf(2))
  }

  override def eval(buf: MadAgg.Buf): Any = {
    if (dec) {
      if (buf.bigs.isEmpty) return null
      val dt = child.dataType.asInstanceOf[DecimalType]
      val vals = buf.bigs.sorted.toArray
      val med = medianOfSortedBig(vals)
      val dev = vals.map(v => v.subtract(med).abs()).sorted
      Decimal(medianOfSortedBig(dev)
        .setScale(dt.scale, java.math.RoundingMode.DOWN), dt.precision, dt.scale)
    } else {
      if (buf.ds.isEmpty) return null
      val vals = buf.ds.toArray
      java.util.Arrays.sort(vals)
      val med = medianOfSorted(vals)
      val dev = vals.map(v => math.abs(v - med))
      java.util.Arrays.sort(dev)
      medianOfSorted(dev)
    }
  }

  override def serialize(buf: MadAgg.Buf): Array[Byte] = {
    val bigBytes = graft.functions.DecAggUtil.serializeBigs(buf.bigs)
    val bb = ByteBuffer.allocate(8 + 8 * buf.ds.length + bigBytes.length)
    bb.putInt(buf.ds.length)
    buf.ds.foreach(bb.putDouble)
    bb.putInt(bigBytes.length)
    bb.put(bigBytes)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MadAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += bb.getDouble; i += 1 }
    val nb = bb.getInt
    val arr = new Array[Byte](nb)
    bb.get(arr)
    MadAgg.Buf(buf, graft.functions.DecAggUtil.deserializeBigs(arr))
  }

  override def nullable: Boolean = true
  override def dataType: DataType =
    if (dec) child.dataType else DoubleType
  override def withNewMutableAggBufferOffset(newOffset: Int): MadAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MadAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MadAgg =
    copy(child = newChild)
  override def prettyName: String = "mad"
}
object MadAgg {
  case class Buf(ds: mutable.ArrayBuffer[Double],
                 bigs: mutable.ArrayBuffer[java.math.BigDecimal])
}

/** DuckDB `product(x)`: exact DOUBLE multiplication (keeps IEEE signed
  * zero: product(2, 0, -4) = -0.0 — measured), NULLs skipped, empty /
  * all-NULL group -> NULL. Constant-size buffer, fully partial-able.
  */
case class ProductAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ProductAgg.Buf] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ProductAgg.Buf = new ProductAgg.Buf

  override def update(buf: ProductAgg.Buf, input: InternalRow): ProductAgg.Buf = {
    val v = child.eval(input)
    if (v != null) { buf.p *= v.asInstanceOf[Double]; buf.seen = true }
    buf
  }

  override def merge(b1: ProductAgg.Buf, b2: ProductAgg.Buf): ProductAgg.Buf = {
    if (b2.seen) { b1.p *= b2.p; b1.seen = true }
    b1
  }

  override def eval(buf: ProductAgg.Buf): Any = if (buf.seen) buf.p else null

  override def serialize(buf: ProductAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(9)
    bb.putDouble(buf.p)
    bb.put(if (buf.seen) 1.toByte else 0.toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ProductAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new ProductAgg.Buf
    b.p = bb.getDouble
    b.seen = bb.get() == 1
    b
  }

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def withNewMutableAggBufferOffset(newOffset: Int): ProductAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ProductAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
  override def prettyName: String = "product"
}

object ProductAgg {
  final class Buf {
    var p: Double = 1d
    var seen: Boolean = false
  }
}
