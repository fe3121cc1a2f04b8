package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB interval arithmetic (r14 interval barrage): an interval is a
  * (months, days, micros) TRIPLE and `* / integer` act PER FIELD with
  * INTEGER division — measured `INTERVAL '1 day' / 2` is '00:00:00'
  * (days 1/2 = 0), `'1 day 2 hours' / 2` is '01:00:00', `'1 minute'/7`
  * TRUNCATES micros to 00:00:08.571428. `+ -` keep the fields
  * unnormalized ('1 day' - '26 hours' renders '1 day -26:00:00').
  * Spark's flat-micros DT arithmetic reproduces none of these, so
  * interval-literal expressions are routed here pre-analysis (the
  * result is CalendarIntervalType — real fields). Known edge: a
  * NON-literal day-time interval (a timestamp difference) dividing by
  * an integer stays on Spark's flat path.
  */
object IntervalFields {
  private val DayUs = 86400L * 1000000L
  def of(dt: DataType, v: Any): (Long, Long, Long) = dt match {
    case _: YearMonthIntervalType => (v.asInstanceOf[Int].toLong, 0L, 0L)
    case d: DayTimeIntervalType =>
      val us = v.asInstanceOf[Long]
      if (d.startField == DayTimeIntervalType.DAY) (0L, us / DayUs, us % DayUs)
      else (0L, 0L, us)
    case CalendarIntervalType =>
      val ci = v.asInstanceOf[CalendarInterval]
      (ci.months.toLong, ci.days.toLong, ci.microseconds)
    case StringType => IntervalText.parse(v.toString)
    case other =>
      throw new IllegalArgumentException(s"not an interval: ${other.simpleString}")
  }
  def isIntervalish(t: DataType): Boolean = t match {
    case _: YearMonthIntervalType | _: DayTimeIntervalType |
         CalendarIntervalType | StringType | NullType => true
    case _ => false
  }
  def make(m: Long, d: Long, us: Long): CalendarInterval =
    new CalendarInterval(Math.toIntExact(m), Math.toIntExact(d), us)
}

/** interval * n / interval / n, n INTEGRAL only (a non-integer
  * multiplier is a DuckDB binder error — refused loudly upstream) */
case class IvScale(left: Expression, right: Expression, div: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override def prettyName: String = if (div) "iv_div" else "iv_mul"
  override def checkInputDataTypes(): TypeCheckResult =
    if (!IntervalFields.isIntervalish(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"not an interval: ${left.dataType.simpleString}")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"interval ${if (div) "/" else "*"} ${other.simpleString} has no " +
        "DuckDB overload (binder error there): cast the factor to an integer")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (m, d, us) = IntervalFields.of(left.dataType, l)
    val n = r match {
      case b: Byte => b.toLong; case s: Short => s.toLong
      case i: Int => i.toLong; case l0: Long => l0
    }
    if (div) {
      require(n != 0L, "Division of interval by zero")
      IntervalFields.make(m / n, d / n, us / n)
    } else IntervalFields.make(Math.multiplyExact(m, n),
      Math.multiplyExact(d, n), Math.multiplyExact(us, n))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvScale =
    copy(left = l, right = r)
}

/** interval ± interval, per-field, fields stay unnormalized */
case class IvAdd(left: Expression, right: Expression, sub: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override def prettyName: String = if (sub) "iv_sub" else "iv_add"
  override def checkInputDataTypes(): TypeCheckResult =
    if (IntervalFields.isIntervalish(left.dataType) &&
        IntervalFields.isIntervalish(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"not intervals: ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (m1, d1, u1) = IntervalFields.of(left.dataType, l)
    val (m2, d2, u2) = IntervalFields.of(right.dataType, r)
    val s = if (sub) -1L else 1L
    IntervalFields.make(Math.addExact(m1, s * m2), Math.addExact(d1, s * d2),
      Math.addExact(u1, s * u2))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvAdd =
    copy(left = l, right = r)
}

/** interval -> normalized BIGINT micros for COMPARISON: DuckDB
  * micros-normalizes across flavors with 1 month = 30 days (measured:
  * `1 MONTH = 30 DAY` true, `1 YEAR = 360 DAY` true, one micro
  * decides). Literal cross-flavor comparisons route here. */
case class IvNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "iv_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    if (IntervalFields.isIntervalish(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"not an interval: ${child.dataType.simpleString}")
  override def nullSafeEval(v: Any): Any = {
    val (m, d, us) = IntervalFields.of(child.dataType, v)
    val dayUs = 86400L * 1000000L
    Math.addExact(Math.multiplyExact(Math.addExact(Math.multiplyExact(m, 30L), d),
      dayUs), us)
  }
  override protected def withNewChildInternal(c: Expression): IvNorm =
    copy(child = c)
}

/** CalendarInterval from explicit (months, days, micros) — the router
  * emits this for MIXED-family interval literals Spark's parser
  * refuses (`INTERVAL '1 month 1 day 1 hour'` is mixedIntervalUnits
  * there; DuckDB takes it verbatim) */
case class IvMake(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = CalendarIntervalType
  override def prettyName: String = "iv_make"
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("iv_make takes three integers")
  override def nullSafeEval(m: Any, d: Any, us: Any): Any = {
    def l(x: Any): Long = x match {
      case b: Byte => b.toLong; case s: Short => s.toLong
      case i: Int => i.toLong; case v: Long => v
    }
    IntervalFields.make(l(m), l(d), l(us))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): IvMake = copy(first = a, second = b, third = c)
}
