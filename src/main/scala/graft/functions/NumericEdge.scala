package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DuckDB-exact numeric edge semantics (r15 numedge barrage — every rule
  * below MEASURED on DuckDB 1.0.0):
  *
  *  - trunc(x): toward-zero truncation keeping the input flavor
  *    (DOUBLE stays DOUBLE, DECIMAL(p,s) becomes DECIMAL(p-s+1,0),
  *    integrals identity). Spark has no 1-arg numeric trunc at all.
  *  - sign(x): TINYINT -1/0/1 — and sign(NaN) = 0. Spark's signum is
  *    DOUBLE and NaN-propagating.
  *  - factorial(n): HUGEINT there, DECIMAL(38,0) here (renders the same
  *    plain digits); n < 0 returns 1 (measured!); n > 33 overflows
  *    128 bits and must stay a LOUD error. Spark's factorial silently
  *    NULLs past 20.
  *  - fmod(a, b): FLOORED double modulo (sign of the divisor —
  *    fmod(-7.5, 2) = 0.5), NULL on a zero divisor, always DOUBLE.
  *    Spark's % / mod are C-style (sign of the dividend).
  *  - sqrt / ln / log10 / log2 of a NEGATIVE (or log of zero) is a LOUD
  *    Out of Range error there, while NaN input passes through as NaN —
  *    Spark silently yields NaN/NULL instead.
  */
object NumericEdge {
  def truncDouble(x: Double): Double =
    if (x < 0) math.ceil(x) else math.floor(x)

  def factorial(n: Long): Decimal = {
    if (n > 33) throw new ArithmeticException(
      s"factorial($n) overflows HUGEINT (DuckDB refuses above 33!)")
    var acc = java.math.BigInteger.ONE
    var i = 2L
    while (i <= n) { acc = acc.multiply(java.math.BigInteger.valueOf(i)); i += 1 }
    Decimal(new java.math.BigDecimal(acc), 38, 0)
  }

  def fmod(a: Double, b: Double): Any =
    if (b == 0.0) null
    else {
      val q = math.floor(a / b)
      val r = a - q * b
      r
    }

  def guarded(kind: String, x: Double): Double = {
    if (java.lang.Double.isNaN(x)) return x // NaN passes through (measured)
    kind match {
      case "sqrt" =>
        if (x < 0) throw new ArithmeticException(
          "cannot take square root of a negative number")
        math.sqrt(x)
      case "ln" =>
        if (x <= 0) throw new ArithmeticException(
          if (x == 0) "cannot take logarithm of zero"
          else "cannot take logarithm of a negative number")
        math.log(x)
      case "log10" =>
        if (x <= 0) throw new ArithmeticException(
          if (x == 0) "cannot take logarithm of zero"
          else "cannot take logarithm of a negative number")
        math.log10(x)
      case "log2" =>
        if (x <= 0) throw new ArithmeticException(
          if (x == 0) "cannot take logarithm of zero"
          else "cannot take logarithm of a negative number")
        math.log(x) / math.log(2.0)
    }
  }

  private[functions] def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }

  /** trunc(DECIMAL(p,s)) -> DECIMAL(min(38, p-s+1), 0), toward zero */
  def truncDecimal(dec: Decimal, srcPrecision: Int, srcScale: Int): Decimal =
    Decimal(dec.toJavaBigDecimal.setScale(0, java.math.RoundingMode.DOWN),
      math.min(38, srcPrecision - srcScale + 1), 0)

  /** `a << b` guard ladder, measured order (r16 probe): negative b errors
    * first, then negative a (even at b = 0), then a zero a short-circuits
    * to 0 for ANY non-negative b ('0::bigint << 64' = 0 there), and only
    * then an out-of-width b or a shifted-out bit errors. */
  def shiftLeft(a: Long, b: Long, w: Int): Long = {
    if (b < 0) throw new ArithmeticException(
      s"Cannot left-shift by negative number $b")
    if (a < 0) throw new ArithmeticException(
      s"Cannot left-shift negative number $a")
    if (a == 0) return 0L
    if (b >= w) throw new ArithmeticException(
      s"Left-shift value $b is out of range")
    val r = a << b
    val lo = -(1L << (w - 1))
    val hi = (1L << (w - 1)) - 1
    if ((r >> b) != a || r < lo || r > hi) throw new ArithmeticException(
      s"Overflow in left shift ($a << $b)")
    r
  }

  /** `a >> b`: arithmetic in range, 0 for any out-of-range amount */
  def shiftRight(a: Long, b: Long, w: Int): Long =
    if (b < 0 || b >= w) 0L else a >> b

  /** 3-arg substr window semantics — see [[DuckSubstring3]] */
  def substr3(s: org.apache.spark.unsafe.types.UTF8String, p: Long,
      l: Long): org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numChars()
    val a = if (p > 0 || p == 0) p else n + p + 1
    val b = a + l
    val lo = math.max(math.min(a, b), 1L)
    val hi = math.min(math.max(a, b), n + 1L)
    if (hi <= lo) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    else s.substring(lo.toInt - 1, hi.toInt - 1)
  }
}

/** `trunc(x)` — see [[NumericEdge]]. Type dispatch happens at codegen
  * time (child.dataType is static), so the per-row path is a single
  * static call inside whole-stage codegen. */
case class DuckTrunc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case d: DecimalType => DecimalType(math.min(38, d.precision - d.scale + 1), 0)
    case FloatType => DoubleType
    case other => other
  }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case DoubleType => NumericEdge.truncDouble(input.asInstanceOf[Double])
    case FloatType => NumericEdge.truncDouble(input.asInstanceOf[Float].toDouble)
    case d: DecimalType =>
      NumericEdge.truncDecimal(input.asInstanceOf[Decimal], d.precision, d.scale)
    case _ => input // integrals pass through
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case DoubleType =>
        s"${ev.value} = graft.functions.NumericEdge.truncDouble($c);"
      case FloatType =>
        s"${ev.value} = graft.functions.NumericEdge.truncDouble((double)($c));"
      case d: DecimalType =>
        s"${ev.value} = graft.functions.NumericEdge.truncDecimal($c, ${d.precision}, ${d.scale});"
      case _ => s"${ev.value} = $c;"
    })
  override protected def withNewChildInternal(newChild: Expression): DuckTrunc =
    copy(child = newChild)
}

/** `sign(x)` — TINYINT, NaN -> 0; see [[NumericEdge]] */
case class DuckSign(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ByteType
  override def nullSafeEval(input: Any): Any = {
    val d = NumericEdge.toD(input)
    if (java.lang.Double.isNaN(d)) 0.toByte
    else if (d > 0) 1.toByte else if (d < 0) (-1).toByte else 0.toByte
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val conv = child.dataType match {
        case _: DecimalType => s"$c.toDouble()"
        case _ => s"(double)($c)"
      }
      s"""double __gs = $conv;
         |${ev.value} = Double.isNaN(__gs) ? (byte) 0
         |  : __gs > 0 ? (byte) 1 : __gs < 0 ? (byte) -1 : (byte) 0;""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): DuckSign =
    copy(child = newChild)
}

/** `factorial(n)` — DECIMAL(38,0), loud above 33; see [[NumericEdge]] */
case class DuckFactorial(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullSafeEval(input: Any): Any =
    NumericEdge.factorial(input.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NumericEdge.factorial((long)($c));")
  override protected def withNewChildInternal(newChild: Expression): DuckFactorial =
    copy(child = newChild)
}

/** `fmod(a, b)` — floored double modulo, NULL on zero divisor */
case class DuckFmod(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); if (a == null) return null
    val b = right.eval(input); if (b == null) return null
    NumericEdge.fmod(NumericEdge.toD(a), NumericEdge.toD(b))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def conv(v: String, dt: DataType): String = dt match {
      case _: DecimalType => s"$v.toDouble()"
      case NullType => "0.0"
      case _ => s"(double)($v)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bd = conv(b, right.dataType)
      s"""double __fb = $bd;
         |if (__fb == 0.0) { ${ev.isNull} = true; }
         |else {
         |  double __fa = ${conv(a, left.dataType)};
         |  ${ev.value} = __fa - Math.floor(__fa / __fb) * __fb;
         |}""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckFmod =
    copy(left = l, right = r)
}

/** 3-arg `substr(s, p, l)` with DuckDB's WINDOW semantics (measured):
  * the window is [p, p+l) in 1-based code-point positions (negated ends
  * swap, so a negative l extends backward), a non-positive p counts
  * into the window (substr('abcdef', 0, 3) = 'ab'), a negative p counts
  * from the END (n + p + 1), and the window clips to [1, n+1]. Equal to
  * Spark's substring for p >= 1 && l >= 0.
  */
case class DuckSubstring3(str: Expression, pos: Expression, len: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = str
  override def second: Expression = pos
  override def third: Expression = len
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(s0: Any, p0: Any, l0: Any): Any =
    NumericEdge.substr3(s0.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p0.asInstanceOf[Number].longValue(), l0.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, l) =>
      s"${ev.value} = graft.functions.NumericEdge.substr3($s, (long)($p), (long)($l));")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): DuckSubstring3 = copy(str = a, pos = b, len = c)
}

/** `a << b` / `a >> b` with DuckDB's typed guards (measured):
  *  - the result KEEPS the left operand's integral type
  *  - left shift: negative a or b is a LOUD error; a shift amount at or
  *    beyond the type width, or any shifted-out significant/sign bit,
  *    is a LOUD overflow ("1 << 31" errors on INT32, "1::BIGINT << 62"
  *    is fine) — Spark's shiftleft silently wraps (1 << 63 gave a
  *    wrapped garbage value through the lake before r15)
  *  - right shift: ARITHMETIC for in-range amounts; any out-of-range
  *    amount (negative, or >= width) yields 0, never an error
  */
case class GuardedShift(left: Expression, right: Expression, isLeft: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = left.dataType match {
    case ByteType | ShortType | IntegerType | LongType => left.dataType
    case StringType => StringType // BIT carrier: fixed-width zero-fill (r16)
    case _ => LongType
  }
  private def width: Int = dataType match {
    case ByteType => 8
    case ShortType => 16
    case IntegerType => 32
    case _ => 64
  }
  override def nullable: Boolean = left.nullable || right.nullable
  override def eval(input: InternalRow): Any = {
    val a0 = left.eval(input); if (a0 == null) return null
    val b0 = right.eval(input); if (b0 == null) return null
    if (left.dataType == StringType)
      return graft.functions.BitBlobUtil.bitShift(
        a0.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b0.asInstanceOf[Number].longValue(), isLeft)
    val a = a0.asInstanceOf[Number].longValue()
    val b = b0.asInstanceOf[Number].longValue()
    val out: Long =
      if (isLeft) NumericEdge.shiftLeft(a, b, width)
      else NumericEdge.shiftRight(a, b, width)
    dataType match {
      case ByteType => out.toByte
      case ShortType => out.toShort
      case IntegerType => out.toInt
      case _ => out
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (left.dataType == StringType)
      return nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.BitBlobUtil.bitShift($a, (long)($b), $isLeft);")
    val fn = if (isLeft) "shiftLeft" else "shiftRight"
    val castBack = dataType match {
      case ByteType => "(byte)"
      case ShortType => "(short)"
      case IntegerType => "(int)"
      case _ => "(long)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $castBack graft.functions.NumericEdge.$fn((long)($a), (long)($b), $width);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GuardedShift =
    copy(left = l, right = r)
}

/** sqrt/ln/log10/log2 with DuckDB's loud out-of-range guards */
case class GuardedMath(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    NumericEdge.guarded(kind, NumericEdge.toD(input))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val conv = child.dataType match {
        case _: DecimalType => s"$c.toDouble()"
        case _ => s"(double)($c)"
      }
      s"""${ev.value} = graft.functions.NumericEdge.guarded("$kind", $conv);"""
    })
  override protected def withNewChildInternal(newChild: Expression): GuardedMath =
    copy(child = newChild)
}
