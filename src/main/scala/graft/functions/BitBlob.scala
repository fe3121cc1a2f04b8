package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-exact UUID / BIT / BLOB value semantics (r16 uuid-blob
  * barrage — every rule MEASURED on DuckDB 1.0.0):
  *
  *  - STRING -> BLOB decodes `\xHH` escapes into single bytes and
  *    REFUSES non-ASCII bytes and malformed escapes ("unterminated",
  *    bad hex). Spark's string->binary cast takes raw UTF-8 — a blob
  *    literal like '\x41\x42' silently became 8 bytes before this.
  *  - STRING -> UUID accepts canonical-hyphen, bare-32-hex and
  *    brace-wrapped forms and renders canonical LOWERCASE 8-4-4-4-12;
  *    Spark kept the input case (silent compare/render divergence).
  *  - BIT is carried as a '0'/'1' VARCHAR (the lake column type already
  *    used that carrier): casts validate non-empty [01]+ loudly;
  *    bitstring() left-pads to a target width; get_bit/set_bit are
  *    0-based with loud out-of-range; bit_position is 1-based, 0 when
  *    absent; bit_count counts ones (BIGINT there); octet_length of a
  *    BIT is ceil(bits/8) — the rewrite layer routes the lexical-BIT
  *    spellings, column-typed BIT carriers keep VARCHAR semantics
  *    (documented divergence, carrier-visible).
  *  - `a << b` / `>> ` on BIT shift within the FIXED width, zero-fill
  *    ('001'::BIT << 1 = '010') — dispatched from GuardedShift's string
  *    branch at the same registry name.
  */
object BitBlobUtil {
  def strToBlob(s: UTF8String, tryMode: Boolean): Any = {
    val bytes = s.getBytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    def fail(msg: String): Any =
      if (tryMode) return null
      else throw new IllegalArgumentException(s"Conversion Error: $msg")
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 0x80) return fail(
        "Invalid byte encountered in STRING -> BLOB conversion. All " +
          "non-ascii characters must be escaped with hex codes (e.g. \\xAA)")
      if (b == '\\') {
        // a valid escape is exactly `\xHH` — anything shorter or not
        // starting with 'x' is "unterminated" (measured: '\q', '\x4')
        if (i + 3 >= bytes.length || bytes(i + 1) != 'x') return fail(
          "Invalid hex escape code encountered in string -> blob " +
            "conversion: unterminated escape sequence")
        val h1 = Character.digit(bytes(i + 2).toChar, 16)
        val h2 = Character.digit(bytes(i + 3).toChar, 16)
        if (h1 < 0 || h2 < 0) return fail(
          "Invalid hex escape code encountered in string -> blob " +
            s"conversion: \\x${bytes(i + 2).toChar}${bytes(i + 3).toChar}")
        out.write(h1 * 16 + h2)
        i += 4
      } else { out.write(b); i += 1 }
    }
    out.toByteArray
  }

  def strToBit(s: UTF8String, tryMode: Boolean): Any = {
    val t = s.toString
    def fail(msg: String): Any =
      if (tryMode) null
      else throw new IllegalArgumentException(s"Conversion Error: $msg")
    if (t.isEmpty) return fail("Cannot cast empty string to BIT")
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c != '0' && c != '1') return fail(
        s"Invalid character encountered in string -> bit conversion: '$c'")
      i += 1
    }
    s
  }

  def strToUuid(s: UTF8String, tryMode: Boolean): Any = {
    val raw = s.toString.trim
    val unbraced =
      if (raw.length >= 2 && raw.head == '{' && raw.last == '}')
        raw.substring(1, raw.length - 1)
      else raw
    val hex = unbraced.replace("-", "")
    val ok = hex.length == 32 && hex.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
    if (!ok) {
      if (tryMode) return null
      // measured error text: DuckDB parses UUIDs through INT128
      throw new IllegalArgumentException(
        s"Conversion Error: Could not convert string '$raw' to INT128")
    }
    val l = hex.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(
      l.substring(0, 8) + "-" + l.substring(8, 12) + "-" + l.substring(12, 16) +
        "-" + l.substring(16, 20) + "-" + l.substring(20))
  }

  private def requireBit(s: UTF8String): String = {
    strToBit(s, tryMode = false)
    s.toString
  }

  def bitstring(s: UTF8String, n: Int): UTF8String = {
    val t = requireBit(s)
    if (n < t.length) throw new IllegalArgumentException(
      "Invalid Input Error: Length must be equal or larger than input string")
    UTF8String.fromString("0" * (n - t.length) + t)
  }

  def getBit(s: UTF8String, i: Int): Int = {
    val t = requireBit(s)
    if (i < 0 || i >= t.length) throw new ArithmeticException(
      s"Out of Range Error: bit index $i out of valid range (0..${t.length - 1})")
    t.charAt(i) - '0'
  }

  def setBit(s: UTF8String, i: Int, v: Int): UTF8String = {
    val t = requireBit(s)
    if (i < 0 || i >= t.length) throw new ArithmeticException(
      s"Out of Range Error: bit index $i out of valid range (0..${t.length - 1})")
    if (v != 0 && v != 1) throw new IllegalArgumentException(
      "Invalid Input Error: The new bit must be 1 or 0")
    UTF8String.fromString(t.updated(i, if (v == 0) '0' else '1'))
  }

  def bitPosition(sub: UTF8String, str: UTF8String): Int = {
    val needle = requireBit(sub)
    val hay = requireBit(str)
    hay.indexOf(needle) + 1 // 1-based; 0 when absent (measured)
  }

  def bitCountStr(s: UTF8String): Long = {
    val t = requireBit(s)
    var n = 0L
    var i = 0
    while (i < t.length) { if (t.charAt(i) == '1') n += 1; i += 1 }
    n
  }

  /** BIT shift: fixed width, zero-fill (measured: '001'<<1='010',
    * '0110'<<64='0000', '0110'>>-1='0000'; only a negative LEFT amount
    * errors, like the integer flavor) */
  def bitShift(s: UTF8String, by: Long, left: Boolean): UTF8String = {
    val t = requireBit(s)
    val n = t.length
    if (left && by < 0) throw new ArithmeticException(
      s"Cannot left-shift by negative number $by")
    val zeros = "0" * n
    if (by < 0 || by >= n) return UTF8String.fromString(zeros)
    val b = by.toInt
    UTF8String.fromString(
      if (left) t.substring(b) + zeros.substring(0, b)
      else zeros.substring(0, b) + t.substring(0, n - b))
  }
}

/** STRING/BINARY -> BLOB with DuckDB's `\xHH` escape decode */
case class StrToBlob(child: Expression, tryMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable || tryMode
  override def prettyName: String = "to_blob"
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => v
    case _ => BitBlobUtil.strToBlob(v.asInstanceOf[UTF8String], tryMode)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType => nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c;")
      case _ => nullSafeCodeGen(ctx, ev, c =>
        s"""Object __bb = graft.functions.BitBlobUtil.strToBlob($c, $tryMode);
           |if (__bb == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (byte[]) __bb; }""".stripMargin)
    }
  override protected def withNewChildInternal(c: Expression): StrToBlob =
    copy(child = c)
}

/** STRING -> BIT ('0'/'1' VARCHAR carrier), loud on invalid chars */
case class StrToBit(child: Expression, tryMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable || tryMode
  override def prettyName: String = "to_bit"
  override def nullSafeEval(v: Any): Any =
    BitBlobUtil.strToBit(v.asInstanceOf[UTF8String], tryMode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object __bt = graft.functions.BitBlobUtil.strToBit($c, $tryMode);
         |if (__bt == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) __bt; }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): StrToBit =
    copy(child = c)
}

/** STRING -> UUID: canonical lowercase 8-4-4-4-12 render */
case class StrToUuid(child: Expression, tryMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable || tryMode
  override def prettyName: String = "to_uuid"
  override def nullSafeEval(v: Any): Any =
    BitBlobUtil.strToUuid(v.asInstanceOf[UTF8String], tryMode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object __bu = graft.functions.BitBlobUtil.strToUuid($c, $tryMode);
         |if (__bu == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) __bu; }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): StrToUuid =
    copy(child = c)
}

/** `bitstring(s, n)` — left-pad a bit string to width n */
case class BitstringFn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bitstring"
  override def nullSafeEval(s: Any, n: Any): Any =
    BitBlobUtil.bitstring(s.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.BitBlobUtil.bitstring($s, (int)($n));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitstringFn =
    copy(left = l, right = r)
}

/** `get_bit(bit, i)` — 0-based read, loud out-of-range */
case class GetBitFn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "get_bit"
  override def nullSafeEval(s: Any, i: Any): Any =
    BitBlobUtil.getBit(s.asInstanceOf[UTF8String],
      i.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.BitBlobUtil.getBit($s, (int)($i));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GetBitFn =
    copy(left = l, right = r)
}

/** `set_bit(bit, i, v)` — 0-based write, loud out-of-range / bad bit */
case class SetBitFn(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "set_bit"
  override def nullSafeEval(s: Any, i: Any, v: Any): Any =
    BitBlobUtil.setBit(s.asInstanceOf[UTF8String],
      i.asInstanceOf[Number].intValue(), v.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i, v) =>
      s"${ev.value} = graft.functions.BitBlobUtil.setBit($s, (int)($i), (int)($v));")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SetBitFn = copy(first = a, second = b, third = c)
}

/** `bit_position(sub, bit)` — 1-based, 0 when absent */
case class BitPositionFn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_position"
  override def nullSafeEval(a: Any, b: Any): Any =
    BitBlobUtil.bitPosition(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitBlobUtil.bitPosition($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitPositionFn =
    copy(left = l, right = r)
}

/** `bit_count(x)` — BIT carrier counts ones (BIGINT, measured);
  * integrals keep popcount semantics */
case class DuckBitCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case StringType => LongType
    case _ => IntegerType
  }
  override def prettyName: String = "bit_count"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         BooleanType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bit_count does not take ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => BitBlobUtil.bitCountStr(v.asInstanceOf[UTF8String])
    case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
    case _ => java.lang.Long.bitCount(v.asInstanceOf[Number].longValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BitBlobUtil.bitCountStr($c);")
      case BooleanType => nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $c ? 1 : 0;")
      case _ => nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = java.lang.Long.bitCount((long)($c));")
    }
  override protected def withNewChildInternal(c: Expression): DuckBitCount =
    copy(child = c)
}
