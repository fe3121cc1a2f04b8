package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** r12 scalar wave: native twins for refused DuckDB scalars whose exact
  * semantics were measured against DuckDB 1.0 (see BarrageSpec pins).
  * All are codegen-friendly: static-call `nullSafeCodeGen`, no UDFs.
  * Reference behavior: gregwdata/ducklakexl delegates these to DuckDB's
  * C++ scalar library (ducklakexl.py:394); each twin documents the
  * measured contract it reproduces.
  */
object ScalarWave {

  /** DuckDB `age(a, b)` (measured): sign = componentwise negation when
    * a < b; for a >= b, borrow a day when a's time-of-day is earlier
    * than b's, then borrow a month when the day-of-month (post time
    * borrow) is below b's — the day borrow always uses the length of
    * B'S calendar month (not the month before a): age('2024-03-10',
    * '2024-01-15') = '1 month 26 days' (= 10 + 31 - 15, January's 31).
    */
  def age(aMicros: Long, bMicros: Long): UTF8String = {
    if (aMicros < bMicros) {
      val (mo, d, us) = agePos(bMicros, aMicros)
      UTF8String.fromString(IntervalText.render(-mo, -d, -us))
    } else {
      val (mo, d, us) = agePos(aMicros, bMicros)
      UTF8String.fromString(IntervalText.render(mo, d, us))
    }
  }

  private def agePos(aMicros: Long, bMicros: Long): (Long, Long, Long) = {
    val MicrosPerDay = 86400000000L
    def split(us: Long): (java.time.LocalDate, Long) = {
      val day = Math.floorDiv(us, MicrosPerDay)
      (java.time.LocalDate.ofEpochDay(day), Math.floorMod(us, MicrosPerDay))
    }
    val (da0, ta) = split(aMicros)
    val (db, tb) = split(bMicros)
    val timeBorrow = ta < tb
    val micros = if (timeBorrow) ta + MicrosPerDay - tb else ta - tb
    val dayA = da0.getDayOfMonth - (if (timeBorrow) 1 else 0)
    val months0 = (da0.getYear - db.getYear) * 12L +
      (da0.getMonthValue - db.getMonthValue)
    if (dayA < db.getDayOfMonth)
      (months0 - 1, dayA + db.lengthOfMonth() - db.getDayOfMonth, micros)
    else (months0, dayA.toLong - db.getDayOfMonth, micros)
  }

  /** complete calendar months from a to b with DuckDB's add-months
    * clamp (measured: date_sub('month', Jan-31 10:00, Feb-29 10:00) = 1
    * because Jan-31 + 1 month clamps to Feb-29 and 10:00 <= 10:00, but
    * Feb-28 09:00 gives 0; same-day-of-month with an earlier
    * time-of-day does NOT complete the month — where Spark's
    * months_between ignores time when the days match). Signed,
    * symmetric negation.
    */
  def monthsComplete(aMicros: Long, bMicros: Long): Long = {
    if (bMicros < aMicros) return -monthsComplete(bMicros, aMicros)
    def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val a = ldt(aMicros); val b = ldt(bMicros)
    val m0 = (b.getYear - a.getYear) * 12L + (b.getMonthValue - a.getMonthValue)
    if (a.plusMonths(m0).isAfter(b)) m0 - 1 else m0
  }

  /** DuckDB `damerau_levenshtein` (measured): FULL Damerau-Levenshtein
    * (with the alphabet dictionary — 'ca'→'abc' is 2, where the
    * restricted OSA variant says 3) computed over UTF-8 BYTES
    * ('é' vs 'e' = 2). Classic DP, O(|a|·|b|) time and space — fine for
    * the identifier/word-length strings the reference's users feed it;
    * corpus-scale fuzzy joins should use the MinHash/LSH operators.
    */
  def damerau(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes; val t = b.getBytes
    val n = s.length; val m = t.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // d is (n+2) x (m+2) with the -inf guard row/col of the classic
    // dictionary-based full-DL formulation
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Byte, Int]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = da.getOrDefault(t(j - 1), 0)
        val j1 = db
        val cost = if (s(i - 1) == t(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }

  /** DuckDB `bar(x, min, max, width)` (measured): fraction clamped to
    * [0,1], `blocks = fraction*width`, floor full blocks of U+2588, one
    * partial eighth-block U+2589..U+258F when floor((blocks-full)*8)>0,
    * then — the measured quirk — space-padded up to `width` BYTES (a
    * full block is 3 UTF-8 bytes, so any bar with >=ceil(width/3)
    * blocks gets no padding while an empty bar is `width` spaces).
    */
  def bar(x: Double, lo: Double, hi: Double, width: Double): UTF8String = {
    val frac0 = (x - lo) / (hi - lo)
    val frac = if (frac0.isNaN) 0.0 else math.min(1.0, math.max(0.0, frac0))
    val blocks = frac * width
    val full = blocks.toInt
    val partIdx = ((blocks - full) * 8).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (partIdx > 0) sb.append((0x2590 - partIdx).toChar)
    var bytes = full * 3 + (if (partIdx > 0) 3 else 0)
    val target = math.round(width).toInt
    while (bytes < target) { sb.append(' '); bytes += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** DuckDB `len(x)` — BIGINT length with type dispatch: codepoints for
  * VARCHAR (len('héllo') = 5), bytes for BLOB, element count for LIST.
  * One native covers what Spark splits across length()/size().
  */
case class LenOf(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len() needs VARCHAR, BLOB or LIST, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case _: ArrayType =>
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements().toLong
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"(long)($c).numChars()"
      case BinaryType => s"(long)($c).length"
      case _: ArrayType => s"(long)($c).numElements()"
    })
  override protected def withNewChildInternal(c: Expression): LenOf = copy(child = c)
  override def prettyName: String = "len"
}

/** DuckDB `list_sum` (measured): skips NULL elements, NULL for
  * empty/all-NULL lists; HUGEINT for integral elements (this lake's
  * HUGEINT convention is DECIMAL(38,0)), exact DECIMAL(38,s) for
  * decimal elements, DOUBLE otherwise.
  */
case class ListSum(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"list_sum() needs a numeric list, got ${other.simpleString}")
  }
  override def dataType: DataType = elem match {
    case e if integral(e) => DecimalType(38, 0)
    case d: DecimalType => DecimalType(38, d.scale)
    case _ => DoubleType
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var count = 0
    if (dataType == DoubleType) {
      var s = 0d
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          s += arr.get(i, elem).asInstanceOf[Number].doubleValue(); count += 1
        }
        i += 1
      }
      if (count == 0) null else s
    } else {
      var s = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          s = s.add(DecAggUtil.toBig(arr.get(i, elem), elem)); count += 1
        }
        i += 1
      }
      if (count == 0) null
      else {
        val dt = dataType.asInstanceOf[DecimalType]
        Decimal(s.setScale(dt.scale), dt.precision, dt.scale)
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): ListSum = copy(child = c)
  override def prettyName: String = "list_sum"
}

/** DuckDB `list_avg` (measured): always DOUBLE, exact sums for
  * integral/decimal elements converted only at the final division
  * (same contract as AvgDuck), NULLs skipped, NULL for empty lists.
  */
case class ListAvg(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def exact: Boolean = elem match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"list_avg() needs a numeric list, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var count = 0
    if (exact) {
      var s = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          s = s.add(DecAggUtil.toBig(arr.get(i, elem), elem)); count += 1
        }
        i += 1
      }
      if (count == 0) null else s.doubleValue() / count
    } else {
      var s = 0d
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          s += arr.get(i, elem).asInstanceOf[Number].doubleValue(); count += 1
        }
        i += 1
      }
      if (count == 0) null else s / count
    }
  }
  override protected def withNewChildInternal(c: Expression): ListAvg = copy(child = c)
  override def prettyName: String = "list_avg"
}

/** DuckDB `gcd` / `lcm` (measured): BIGINT over absolute values
  * (gcd(-12, 18) = 6, lcm(-4, 6) = 12); zero operands give 0.
  */
object GcdLcm {
  def gcd(a0: Long, b0: Long): Long = {
    var a = math.abs(a0); var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }
  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) 0L
    else math.abs(a / gcd(a, b) * b)
  }
}

case class Gcd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("gcd(a, b) needs BIGINTs")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.gcd($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd =
    copy(left = l, right = r)
  override def prettyName: String = "gcd"
}

case class Lcm(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("lcm(a, b) needs BIGINTs")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.lcm($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm =
    copy(left = l, right = r)
  override def prettyName: String = "lcm"
}

/** DuckDB `age(a, b)` — canonical interval text (the lake's INTERVAL
  * carrier, see IntervalText). Timestamp inputs in session-UTC micros.
  */
case class AgeText(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[TimestampType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"age(a, b) needs two timestamps, got ${left.dataType.simpleString}, " +
      right.dataType.simpleString)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ScalarWave.age(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScalarWave.age($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AgeText =
    copy(left = l, right = r)
  override def prettyName: String = "age"
}

/** signed complete-calendar-months count (ScalarWave.monthsComplete's
  * measured DuckDB contract) — the date_sub month/quarter/year family.
  */
case class MonthsComplete(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[TimestampType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "months_complete(a, b) needs two timestamps")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ScalarWave.monthsComplete(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScalarWave.monthsComplete($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MonthsComplete =
    copy(left = l, right = r)
  override def prettyName: String = "months_complete"
}

/** IEEE-754 nextafter — Java's Math.nextAfter is bit-exact with C++
  * std::nextafter (both implement the IEEE step), so the twin is exact.
  */
case class NextAfter(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("nextafter(a, b) needs doubles")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Math.nextAfter($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NextAfter =
    copy(left = l, right = r)
  override def prettyName: String = "nextafter"
}

/** Full Damerau-Levenshtein over UTF-8 bytes, BIGINT like DuckDB's. */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("damerau_levenshtein(a, b) needs strings")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ScalarWave.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScalarWave.damerau($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein"
}

/** DuckDB `bar()` ASCII chart (see ScalarWave.bar for the measured
  * contract, including the pad-to-width-BYTES quirk).
  */
case class BarText(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bar(x, min, max, width) needs doubles")
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ScalarWave.bar(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.ScalarWave.bar($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BarText =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "bar"
}

/** DuckDB `/` (measured): ALWAYS DOUBLE — `6 / 3` is DOUBLE 2.0 and
  * `1 / 2.6` is the full-precision 0.3846153846153846, where Spark
  * keeps DECIMAL division at scale 6 (0.384615 — a silent precision
  * loss the r12 differential barrage caught) — and NULL on a zero
  * divisor (Spark doubles give Infinity, ANSI errors).
  */
case class DoubleDiv(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def numeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | NullType => true
    case _: DecimalType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => numeric(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"/ needs numeric operands, got ${left.dataType.simpleString}, " +
      right.dataType.simpleString)
  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); if (a == null) return null
    val b = right.eval(input); if (b == null) return null
    val d = toD(b); if (d == 0.0) null else toD(a) / d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def conv(v: String, dt: DataType): String =
      if (dt == NullType) "0.0"
      else if (dt.isInstanceOf[DecimalType]) s"$v.toDouble()"
      else s"(double)($v)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bn = ctx.freshName("divB")
      s"""double $bn = ${conv(b, right.dataType)};
         |if ($bn == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (${conv(a, left.dataType)}) / $bn; }
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleDiv =
    copy(left = l, right = r)
  override def prettyName: String = "ddiv"
}

/** DuckDB `//` (measured): integral operands -> integer division
  * truncating toward zero (-7 // 2 = -3), floating operands -> PLAIN
  * division (7.5 // 2 = 3.75 — DuckDB does NOT floor doubles), either
  * divisor zero -> NULL. Type-dispatches at analysis time so one infix
  * rewrite covers both DuckDB behaviors.
  */
case class FloorDiv(left: Expression, right: Expression)
  extends BinaryExpression {
  private def integral(dt: DataType): Boolean = dt match {
    // a NULL-typed operand keeps integer mode: DuckDB types NULL // 2
    // as integer, and the result is NULL either way
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case _ => false
  }
  private lazy val intMode = integral(left.dataType) && integral(right.dataType)
  override def dataType: DataType = if (intMode) LongType else DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => integral(e.dataType) ||
        e.dataType == DoubleType || e.dataType == FloatType ||
        e.dataType.isInstanceOf[DecimalType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"// needs numeric operands, got ${left.dataType.simpleString}, " +
      right.dataType.simpleString)
  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }
  private def toL(v: Any): Long = v.asInstanceOf[Number].longValue()
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); if (a == null) return null
    val b = right.eval(input); if (b == null) return null
    if (intMode) {
      val d = toL(b); if (d == 0L) null else toL(a) / d
    } else {
      val d = toD(b); if (d == 0.0) null else toD(a) / d
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // per-child numeric conversion: Decimal carries an object in codegen;
    // a NullType child's value slot is dead code (its isNull is constant
    // true) but must still typecheck — emit the zero of the mode
    def conv(v: String, dt: DataType): String =
      if (dt == NullType) (if (intMode) "0L" else "0.0")
      else if (dt.isInstanceOf[DecimalType]) s"$v.toDouble()"
      else if (intMode) s"(long)($v)" else s"(double)($v)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (av, bv) = (conv(a, left.dataType), conv(b, right.dataType))
      val (t, zero) = if (intMode) ("long", "0L") else ("double", "0.0")
      val bn = ctx.freshName("fdivB")
      s"""$t $bn = $bv;
         |if ($bn == $zero) { ${ev.isNull} = true; }
         |else { ${ev.value} = ($av) / $bn; }
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloorDiv =
    copy(left = l, right = r)
  override def prettyName: String = "fdiv"
}
