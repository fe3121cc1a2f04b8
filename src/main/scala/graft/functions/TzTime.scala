package graft.functions

import java.time.{Instant, LocalDateTime, ZoneId, ZoneOffset, ZonedDateTime}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{DataType, DayTimeIntervalType, StringType, TimeType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB TIMESTAMPTZ / TIME semantics (measured on REAL DuckDB 1.0 —
  * r13 tz differential barrage; reference surface reachable through
  * `ducklakexl.py:394`), twinned over Spark's instant-typed
  * TimestampType plus Spark 4.1's TimeType (`spark.sql.timeType.enabled`):
  *
  *  - DuckDB TIMESTAMPTZ is an instant = Spark TimestampType with the
  *    session pinned UTC; what differs is only the VARCHAR render
  *    (`… +00` suffix). [[TsTzTag]] marks tz-ness in the expression
  *    tree, [[graft.api.DuckLakeXLSpark]]'s post-analysis pass swaps a
  *    `CAST(tagged AS VARCHAR)` for [[TsTzVarchar]]. The tag is an
  *    IDENTITY at runtime (codegen passes straight through).
  *  - `x AT TIME ZONE z` / `timezone(z, x)` dispatch on the INPUT's
  *    tz-ness: naive -> instant (interpret wall clock in z), instant ->
  *    naive (wall clock of the instant in z). Measured DST behavior:
  *    gap times shift forward; AMBIGUOUS fall-back times resolve to the
  *    LATER instant (ICU), which is why the conversion is a custom eval
  *    (java.time defaults to the earlier offset).
  *  - TIME ± INTERVAL wraps modulo 24h (measured `23:30 + 1h = 00:30`);
  *    Spark's TimeAddInterval raises DATETIME_OVERFLOW instead, so the
  *    post-analysis pass swaps in [[TimeAddWrap]].
  *  - `CAST(x AS TIME)` takes a timestamp's time-of-day or parses a
  *    string ([[ToTimeDuck]]; Spark's cast lacks the timestamp source).
  */
case class TsTzTag(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "tstz"
  override def nullSafeEval(v: Any): Any = v
  override def nullable: Boolean = child.nullable
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): TsTzTag = copy(child = c)
}

/** identity barrier: the subtree below is NAIVE regardless of tags
  * (the result of instant -> wall-clock conversion)
  */
case class NaiveTag(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "ts_naive"
  override def nullSafeEval(v: Any): Any = v
  override def nullable: Boolean = child.nullable
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): NaiveTag = copy(child = c)
}

object TzTrace {
  /** does `e` carry DuckDB TIMESTAMPTZ semantics? DFS with barriers:
    * a TsTzTag is tz; a NaiveTag is naive (the router plants it for the
    * user's explicit `CAST(tz AS TIMESTAMP)` — instant -> naive);
    * AtTimeZoneResolve flips its input's tz-ness. Analyzer-inserted
    * no-op casts stay TRANSPARENT (`tstz + INTERVAL` resolves under
    * one). Attribute references are naive (column-level TIMESTAMPTZ
    * render is out of scope — documented in README).
    */
  def tagged(e: Expression): Boolean = e match {
    case TsTzTag(_) => true
    case NaiveTag(_) => false
    case AtTimeZoneResolve(x, _) => !tagged(x)
    case other => other.children.exists(tagged)
  }
}

/** DayTimeInterval -> CalendarInterval with whole days SPLIT OUT of the
  * micros (trunc toward zero): DuckDB's timestamp difference renders
  * `1 day 02:00:00` where the raw day-time micros would say `26:00:00`
  */
case class IntervalDaysSplit(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.CalendarIntervalType
  override def prettyName: String = "interval_days_split"
  override def nullSafeEval(v: Any): Any = {
    val micros = v.asInstanceOf[Long]
    val dayMicros = 86400L * 1000000L
    new org.apache.spark.unsafe.types.CalendarInterval(
      0, (micros / dayMicros).toInt, micros % dayMicros)
  }
  override protected def withNewChildInternal(c: Expression): IntervalDaysSplit =
    copy(child = c)
}

/** placeholder for `x AT TIME ZONE z` / `timezone(z, x)` — replaced on
  * the analyzed plan (tz-ness of `x` is an expression-tree property, not
  * a type); never evaluated
  */
case class AtTimeZoneResolve(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "at_time_zone"
  override def nullSafeEval(x: Any, z: Any): Any =
    throw new IllegalStateException(
      "AT TIME ZONE placeholder not resolved — statement routed outside sqlSelect")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AtTimeZoneResolve =
    copy(left = l, right = r)
}

object TzConvert {
  private val MicrosPerSecond = 1000000L

  private def zone(z: String): ZoneId =
    try ZoneId.of(z)
    catch { case _: Exception =>
      throw new IllegalArgumentException(s"unknown time zone: $z") }

  /** naive wall-clock micros -> instant micros, zone rules of `z`;
    * ambiguous local times take the LATER instant (measured DuckDB/ICU:
    * `2024-11-03 01:30 America/New_York -> 06:30 UTC`), gap times shift
    * forward (`02:30 -> 07:30 UTC`, both measured)
    */
  def wallToInstant(micros: Long, z: String): Long = {
    val ldt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, MicrosPerSecond), 0, ZoneOffset.UTC)
      .plusNanos(Math.floorMod(micros, MicrosPerSecond) * 1000)
    val zdt = ZonedDateTime.ofLocal(ldt, zone(z), null).withLaterOffsetAtOverlap()
    zdt.toEpochSecond * MicrosPerSecond + zdt.getNano / 1000
  }

  /** instant micros -> naive wall-clock micros in zone `z` */
  def instantToWall(micros: Long, z: String): Long = {
    val ins = Instant.ofEpochSecond(
      Math.floorDiv(micros, MicrosPerSecond),
      Math.floorMod(micros, MicrosPerSecond) * 1000)
    val ldt = LocalDateTime.ofInstant(ins, zone(z))
    ldt.toEpochSecond(ZoneOffset.UTC) * MicrosPerSecond + ldt.getNano / 1000
  }
}

/** naive wall clock interpreted in `zone` -> instant (tz-tagged by the
  * resolver). Scalar per-row work with a cached ZoneId — CodegenFallback
  * is fine off the scan hot path.
  */
case class WallToInstant(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "wall_to_instant"
  override def nullSafeEval(x: Any, z: Any): Any =
    TzConvert.wallToInstant(x.asInstanceOf[Long], z.toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WallToInstant =
    copy(left = l, right = r)
}

/** instant -> naive wall clock in `zone` */
case class InstantToWall(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "instant_to_wall"
  override def nullSafeEval(x: Any, z: Any): Any =
    TzConvert.instantToWall(x.asInstanceOf[Long], z.toString)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InstantToWall =
    copy(left = l, right = r)
}

/** DuckDB VARCHAR render of a TIMESTAMPTZ under a UTC session:
  * `yyyy-MM-dd HH:mm:ss[.ffffff]+00`, fraction trimmed of trailing zeros
  */
case class TsTzVarchar(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "tstz_varchar"
  override def nullSafeEval(v: Any): Any = {
    val micros = v.asInstanceOf[Long]
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val fracStr =
      if (frac == 0) ""
      else "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    UTF8String.fromString(base + fracStr + "+00")
  }
  override protected def withNewChildInternal(c: Expression): TsTzVarchar =
    copy(child = c)
}

/** `CAST(x AS TIME)` with DuckDB's sources: a timestamp takes its
  * time-of-day, a string parses `HH:mm[:ss[.ffffff]]`. Result is Spark
  * 4.1's TimeType(6) (Long nanos of day). `tryMode` is the TRY_CAST
  * spelling: an unparseable string yields NULL instead of raising
  * (r14 ADVICE — TRY semantics were silently dropped for TIME targets).
  */
case class ToTimeDuck(child: Expression, tryMode: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimeType(6)
  override def nullable: Boolean = child.nullable || tryMode
  override def prettyName: String = "to_time"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case TimestampType | StringType | _: TimeType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cannot cast ${other.simpleString} to TIME")
    }
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: TimeType => v
    case TimestampType =>
      // micros since epoch (UTC session) -> nanos of day
      Math.floorMod(v.asInstanceOf[Long], 86400L * 1000000L) * 1000L
    case StringType =>
      ToTimeDuck.parseNanos(v.toString.trim) match {
        case Some(n) => n
        case None =>
          if (tryMode) null
          else throw new IllegalArgumentException(
            "Conversion Error: time field value out of range: \"" +
              v.toString.trim + "\", expected format is ([YYYY-MM-DD ]HH:MM:SS[.MS])")
      }
  }
  override protected def withNewChildInternal(c: Expression): ToTimeDuck =
    copy(child = c)
}

object ToTimeDuck {
  // DuckDB's measured TIME grammar: optional date prefix, 1-2 digit
  // hour, REQUIRED seconds ('10:30' is a conversion error), optional
  // fraction. ('24:00:00' is DuckDB-representable but outside Spark's
  // TimeType day range — refused loudly / NULL under TRY.)
  private val TimeRe =
    """^(?:\d{4}-\d{2}-\d{2}[ T])?(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?$""".r
  def parseNanos(t: String): Option[Long] = t match {
    case TimeRe(h, m, s, f) =>
      val (hh, mm, ss) = (h.toInt, m.toInt, s.toInt)
      if (hh > 23 || mm > 59 || ss > 59) None
      else {
        val frac = if (f == null) 0L else (f + "0" * (9 - f.length)).toLong
        Some(((hh * 3600L + mm * 60L + ss) * 1000000000L) + frac)
      }
    case _ => None
  }
}

/** TIME ± day-time INTERVAL with DuckDB's wrap-around-midnight
  * (measured `23:30 + 1h = 00:30`, `00:30 - 1h = 23:30`); Spark's
  * builtin raises DATETIME_OVERFLOW past midnight
  */
case class TimeAddWrap(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private val DayNanos = 86400L * 1000000000L
  override def dataType: DataType = left.dataType match {
    case t: TimeType => t
    case _ => TimeType(6)
  }
  override def prettyName: String = "time_add_wrap"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: TimeType, _: DayTimeIntervalType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"time_add_wrap expects (TIME, day-time interval), got ($l, $r)")
    }
  override def nullSafeEval(t: Any, iv: Any): Any = {
    val nanos = t.asInstanceOf[Long] + iv.asInstanceOf[Long] * 1000L
    Math.floorMod(nanos, DayNanos)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TimeAddWrap =
    copy(left = l, right = r)
}
