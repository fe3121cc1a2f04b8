package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** r12 aggregate-differential closures: DuckDB's numeric aggregates are
  * DECIMAL-aware in ways Spark's are not, and the differences are
  * silent value changes, all measured against DuckDB 1.0:
  * - avg(DECIMAL) is an EXACT sum converted to DOUBLE and divided
  *   (avg of three 0.1s is exactly 0.1; Spark's DECIMAL avg truncates
  *   the quotient at scale+4 — 2.847143 vs 2.847142857142857).
  * - median/quantile_disc return the INPUT type (the lower middle for
  *   even counts on DECIMAL); quantile_cont on DECIMAL interpolates
  *   exactly and TRUNCATES to the input scale (1.045 -> 1.04).
  * - mad(DECIMAL) is the exact decimal median-of-deviations truncated
  *   to the input scale (0.95 -> 0.9).
  * These live here as partial-able TypedImperativeAggregates (same
  * machinery as ProfileAggs), so they work under GROUP BY, windows and
  * FILTER, and merge map-side like any Spark aggregate.
  */
private[functions] object DecAggUtil {
  def isDecimal(dt: DataType): Boolean = dt.isInstanceOf[DecimalType]
  def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  def toBig(v: Any, dt: DataType): JBigDecimal = dt match {
    case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
    case _ => JBigDecimal.valueOf(v.asInstanceOf[Number].longValue())
  }
  def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  def serializeBigs(buf: mutable.ArrayBuffer[JBigDecimal]): Array[Byte] = {
    val sb = new StringBuilder
    buf.foreach { b => sb.append(b.toString); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }
  def deserializeBigs(bytes: Array[Byte]): mutable.ArrayBuffer[JBigDecimal] = {
    val out = mutable.ArrayBuffer.empty[JBigDecimal]
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split('\n').foreach(l => if (l.nonEmpty) out += new JBigDecimal(l))
    out
  }
}

/** DuckDB avg(): always DOUBLE; exact sum for decimal/integral inputs
  * (converted to double only at the final division), plain double sum
  * for floating inputs (matching both engines' double behavior).
  */
case class AvgDuck(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AvgDuck.Buf] with UnaryLike[Expression] {
  import DecAggUtil._

  private lazy val exact = isDecimal(child.dataType) || isIntegral(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avg() needs a numeric input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): AvgDuck.Buf = AvgDuck.Buf(JBigDecimal.ZERO, 0d, 0L)

  override def update(b: AvgDuck.Buf, input: InternalRow): AvgDuck.Buf = {
    val v = child.eval(input)
    if (v == null) return b
    if (exact) AvgDuck.Buf(b.sumExact.add(toBig(v, child.dataType)), 0d, b.count + 1)
    else AvgDuck.Buf(b.sumExact, b.sumD + toD(v), b.count + 1)
  }

  override def merge(a: AvgDuck.Buf, b: AvgDuck.Buf): AvgDuck.Buf =
    AvgDuck.Buf(a.sumExact.add(b.sumExact), a.sumD + b.sumD, a.count + b.count)

  override def eval(b: AvgDuck.Buf): Any =
    if (b.count == 0L) null
    else if (exact) b.sumExact.doubleValue() / b.count
    else b.sumD / b.count

  override def serialize(b: AvgDuck.Buf): Array[Byte] =
    s"${b.sumExact}|${java.lang.Double.doubleToLongBits(b.sumD)}|${b.count}"
      .getBytes(StandardCharsets.UTF_8)
  override def deserialize(bytes: Array[Byte]): AvgDuck.Buf = {
    val parts = new String(bytes, StandardCharsets.UTF_8).split('|')
    AvgDuck.Buf(new JBigDecimal(parts(0)),
      java.lang.Double.longBitsToDouble(parts(1).toLong), parts(2).toLong)
  }

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def withNewMutableAggBufferOffset(o: Int): AvgDuck = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AvgDuck = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): AvgDuck = copy(child = c)
  override def prettyName: String = "avg"
}
object AvgDuck {
  case class Buf(sumExact: JBigDecimal, sumD: Double, count: Long)
}

/** DuckDB median / quantile_disc / quantile_cont with the measured
  * type dispatch (see file scaladoc). `mode` is one of "median",
  * "disc", "cont"; median = cont for non-decimal inputs, disc (lower
  * middle) for DECIMAL.
  */
case class QuantileDuck(
    left: Expression, right: Expression, mode: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileDuck.Buf] with BinaryLike[Expression] {
  import DecAggUtil._

  private lazy val dec = isDecimal(left.dataType)
  private lazy val q: Double = {
    val v = right.eval(null)
    require(v != null, s"$prettyName: the quantile fraction must be a literal")
    toD(v)
  }
  private def discrete: Boolean = mode == "disc" || (mode == "median" && dec)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: fraction must be a literal")
    else if (right.eval(null) == null)
      // both messages are DuckDB 1.0's own Binder errors (measured r17)
      TypeCheckResult.TypeCheckFailure("QUANTILE argument must not be NULL")
    else if (math.abs(toD(right.eval(null))) > 1d)
      // fractions live in [-1, 1]; the old code clamped negatives to
      // the first element (disc) or threw AIOOBE (cont) instead of
      // refusing loudly
      TypeCheckResult.TypeCheckFailure(
        "QUANTILE can only take parameters in the range [-1, 1]")
    else left.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): QuantileDuck.Buf =
    QuantileDuck.Buf(mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)

  override def update(b: QuantileDuck.Buf, input: InternalRow): QuantileDuck.Buf = {
    val v = left.eval(input)
    if (v == null) return b
    if (dec) b.bigs += toBig(v, left.dataType) else b.ds += toD(v)
    b
  }
  override def merge(a: QuantileDuck.Buf, b: QuantileDuck.Buf): QuantileDuck.Buf = {
    a.bigs ++= b.bigs; a.ds ++= b.ds; a
  }

  override def eval(b: QuantileDuck.Buf): Any = {
    val n = if (dec) b.bigs.length else b.ds.length
    if (n == 0) return null
    // DuckDB accepts q in [-1, 1]; a negative fraction counts from the
    // UPPER end (measured r17: quantile_cont(x, -0.25) == quantile_cont
    // (x, 0.75); quantile_disc over 4 rows at -0.75 answers the 2nd
    // sorted value = rank n - ceil(-q*n) + 1, the exact mirror of the
    // positive ceil(q*n) rank)
    val qc = if (q < 0d) 1d + q else q
    val h = qc * (n - 1)
    val lo = math.floor(h).toInt
    val frac = h - lo
    // discrete rank is ceil(p*n) clamped to [1, n] (r16 aggdepth
    // barrage: measured quantile_disc(x, 0.75) over 3 rows answers the
    // 3rd sorted value — the old floor(p*(n-1)) agreed at p=0.25/0.5
    // but not at 0.75)
    val di =
      if (q < 0d) math.min(n, math.max(1, n - math.ceil(-q * n).toInt + 1)) - 1
      else math.min(n, math.max(1, math.ceil(q * n).toInt)) - 1
    if (dec) {
      val dt = left.dataType.asInstanceOf[DecimalType]
      val sorted = b.bigs.sorted
      val bd =
        if (discrete) sorted(di)
        else if (frac == 0d || lo + 1 >= n) sorted(lo)
        else sorted(lo).add(JBigDecimal.valueOf(frac)
          .multiply(sorted(lo + 1).subtract(sorted(lo))))
      Decimal(bd.setScale(dt.scale, RoundingMode.DOWN), dt.precision, dt.scale)
    } else {
      val sorted = b.ds.toArray
      java.util.Arrays.sort(sorted)
      if (discrete) fromDouble(sorted(di))
      else if (frac == 0d || lo + 1 >= n) sorted(lo)
      else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
    }
  }

  // discrete results carry the INPUT type (quantile_disc of an INT
  // column is an INT, like DuckDB — doubles up to 2^53 round-trip)
  private def fromDouble(v: Double): Any = left.dataType match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case LongType => v.toLong
    case FloatType => v.toFloat
    case _ => v
  }

  override def serialize(b: QuantileDuck.Buf): Array[Byte] = {
    val bigBytes = serializeBigs(b.bigs)
    val bb = java.nio.ByteBuffer.allocate(8 + b.ds.length * 8 + bigBytes.length)
    bb.putInt(b.ds.length)
    b.ds.foreach(bb.putDouble)
    bb.putInt(bigBytes.length)
    bb.put(bigBytes)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): QuantileDuck.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nd = bb.getInt
    val ds = new mutable.ArrayBuffer[Double](nd)
    var i = 0
    while (i < nd) { ds += bb.getDouble; i += 1 }
    val nb = bb.getInt
    val arr = new Array[Byte](nb)
    bb.get(arr)
    QuantileDuck.Buf(ds, deserializeBigs(arr))
  }

  override def nullable: Boolean = true
  override def dataType: DataType =
    if (dec) left.dataType
    else if (discrete) left.dataType
    else DoubleType
  override def withNewMutableAggBufferOffset(o: Int): QuantileDuck = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileDuck = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantileDuck =
    copy(left = l, right = r)
  override def prettyName: String = s"quantile_$mode"
}
object QuantileDuck {
  case class Buf(ds: mutable.ArrayBuffer[Double], bigs: mutable.ArrayBuffer[JBigDecimal])
}
