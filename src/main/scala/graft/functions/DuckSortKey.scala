package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Memcomparable sort key carrying DuckDB's TOTAL order for nested
  * types (r19 nested-ordering differential; every rule measured on real
  * DuckDB 1.0.0):
  *
  *  - NULL **elements/fields** sort LARGEST — `[1,2] < [1,NULL]`,
  *    `[2] < [NULL]`, `{'a':1,'b':NULL}` after `{'a':1,'b':2}` — where
  *    Spark's ordering puts inner NULLs smallest (silently different
  *    row order AND different top-k membership);
  *  - lists compare lexicographically element-first, a strict prefix
  *    sorts first (`['a'] < ['a',NULL] < ['ab']` — the first element
  *    decides before the length does);
  *  - structs compare by FIELD POSITION;
  *  - doubles order values < NaN < NULL (`[inf] < [nan] < [NULL]`).
  *
  * Encoding: per element a marker byte — list terminator 0x00 <
  * present 0x01 < NULL 0x02 — so byte order reproduces the order
  * above; atomics are fixed-width big-endian with the sign bit flipped
  * (integrals, date/timestamp days/micros, ≤18-digit decimal unscaled),
  * IEEE doubles bit-flipped negative / sign-flipped positive with NaN
  * canonicalized, strings/binary 0x00-escaped (0x00→0x00FF) and
  * 0x0000-terminated. Structs are fixed-arity so fields concatenate
  * without a terminator. Top-level NULL stays NULL — SortOrder's
  * null-ordering handles it (the dialect's NULLS LAST default).
  *
  * Swapped in POST-ANALYSIS for ORDER BY keys whose type is
  * ARRAY/STRUCT only — scalar sorts keep Spark's native codegen path.
  * A MAP key (DuckDB orders maps; Spark has no map ordering) refuses
  * loudly.
  */
case class DuckSortKey(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "duck_sort_key"

  private def checkSupported(dt: DataType): Unit = dt match {
    case ArrayType(et, _) => checkSupported(et)
    case st: StructType => st.fields.foreach(f => checkSupported(f.dataType))
    case _: MapType => throw new IllegalArgumentException(
      "ORDER BY over a MAP-typed key is not supported (DuckDB orders " +
        "maps; no Spark ordering exists) — order by map_keys/map_values " +
        "explicitly")
    case d: DecimalType if d.precision > 18 =>
      throw new IllegalArgumentException(
        s"ORDER BY over nested DECIMAL(${d.precision},${d.scale}) keys " +
          "is limited to precision <= 18")
    case StringType | BinaryType | BooleanType | ByteType | ShortType |
        IntegerType | LongType | FloatType | DoubleType | DateType |
        TimestampType | TimestampNTZType =>
    case _: DecimalType =>
    case _: DayTimeIntervalType | _: YearMonthIntervalType =>
    case other => throw new IllegalArgumentException(
      s"cannot build a DuckDB sort key over ${other.sql}")
  }
  checkSupported(child.dataType)

  override protected def nullSafeEval(v: Any): Any = {
    val out = new java.io.ByteArrayOutputStream(64)
    encode(v, child.dataType, out)
    out.toByteArray
  }

  private def putLongBE(out: java.io.ByteArrayOutputStream, l: Long): Unit = {
    var i = 56
    while (i >= 0) { out.write(((l >>> i) & 0xff).toInt); i -= 8 }
  }

  private def encode(v: Any, dt: DataType,
      out: java.io.ByteArrayOutputStream): Unit = dt match {
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (a.isNullAt(i)) out.write(0x02)
        else { out.write(0x01); encode(a.get(i, et), et, out) }
        i += 1
      }
      out.write(0x00)
    case st: StructType =>
      val r = v.asInstanceOf[InternalRow]
      var i = 0
      while (i < st.length) {
        if (r.isNullAt(i)) out.write(0x02)
        else { out.write(0x01); encode(r.get(i, st(i).dataType),
          st(i).dataType, out) }
        i += 1
      }
    case StringType =>
      writeEscaped(v.asInstanceOf[UTF8String].getBytes, out)
    case BinaryType =>
      writeEscaped(v.asInstanceOf[Array[Byte]], out)
    case BooleanType =>
      out.write(if (v.asInstanceOf[Boolean]) 0x01 else 0x00)
    case ByteType => putLongBE(out, v.asInstanceOf[Byte].toLong ^ Long.MinValue)
    case ShortType => putLongBE(out, v.asInstanceOf[Short].toLong ^ Long.MinValue)
    case IntegerType | DateType | _: YearMonthIntervalType =>
      putLongBE(out, v.asInstanceOf[Int].toLong ^ Long.MinValue)
    case LongType | TimestampType | TimestampNTZType |
        _: DayTimeIntervalType =>
      putLongBE(out, v.asInstanceOf[Long] ^ Long.MinValue)
    case FloatType => putDouble(out, v.asInstanceOf[Float].toDouble)
    case DoubleType => putDouble(out, v.asInstanceOf[Double])
    case d: DecimalType =>
      putLongBE(out, v.asInstanceOf[Decimal].toUnscaledLong ^ Long.MinValue)
    case other => throw new IllegalStateException(
      s"unreachable: ${other.sql} passed checkSupported")
  }

  private def putDouble(out: java.io.ByteArrayOutputStream, d: Double): Unit = {
    // canonical NaN so every NaN bit pattern lands in one slot just
    // above +inf; negatives flip all bits, positives flip the sign bit
    val bits0 = java.lang.Double.doubleToLongBits(
      if (java.lang.Double.isNaN(d)) Double.NaN else d)
    val bits = if (bits0 < 0) ~bits0 else bits0 ^ Long.MinValue
    putLongBE(out, bits)
  }

  private def writeEscaped(b: Array[Byte],
      out: java.io.ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < b.length) {
      if (b(i) == 0x00) { out.write(0x00); out.write(0xff) }
      else out.write(b(i).toInt)
      i += 1
    }
    out.write(0x00); out.write(0x00)
  }

  override protected def withNewChildInternal(c: Expression): DuckSortKey =
    copy(child = c)
}
