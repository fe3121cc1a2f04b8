package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Canonical DuckDB-text carrier for the lake's INTERVAL column type
  * (lake/CatalogState.scala stores the logical type string; the physical
  * carrier is VARCHAR). Coerces any Spark interval flavor — ANSI
  * year-month, ANSI day-time, CalendarInterval — or an interval STRING
  * into DuckDB's rendered form, measured against DuckDB 1.0:
  * `1 year 2 months`, `2 days`, `03:04:05`, `1 day 00:00:00.000001`,
  * `-1 month -2 days`, `00:00:00` for zero. A string input parses
  * (units or H:MM:SS[.ffffff]) and re-renders, so every stored cell is
  * canonical regardless of the inserted spelling. Not a hot-path
  * expression (runs once per inserted interval cell) — CodegenFallback.
  */
case class IntervalText(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: YearMonthIntervalType | _: DayTimeIntervalType |
           CalendarIntervalType | StringType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cannot coerce ${other.simpleString} to an INTERVAL column " +
          "(expected an interval value or an interval string)")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val (months, days, micros) = child.dataType match {
      case _: YearMonthIntervalType => (v.asInstanceOf[Int].toLong, 0L, 0L)
      case _: DayTimeIntervalType   => (0L, 0L, v.asInstanceOf[Long])
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[CalendarInterval]
        (ci.months.toLong, ci.days.toLong, ci.microseconds)
      case StringType => IntervalText.parse(v.asInstanceOf[UTF8String].toString)
      case NullType   => return null
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    UTF8String.fromString(IntervalText.render(months, days, micros))
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalText =
    copy(child = newChild)
  override def prettyName: String = "interval_text"
}

object IntervalText {
  private val UnitRe = """([+-]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)""".r
  private val TimeRe = """([+-])?(\d+):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?""".r

  /** parse DuckDB-ish interval text (`1 year 2 months`, `-3 days`,
    * `03:04:05.5`, `1 mon 02:03:04`) into (months, days, micros);
    * anything unrecognized fails LOUDLY (a silently-zero interval is the
    * worst outcome). */
  def parse(s0: String): (Long, Long, Long) = {
    val s = s0.trim.stripPrefix("INTERVAL").trim.stripPrefix("'").stripSuffix("'")
    var months = 0L; var days = 0L; var micros = 0L
    for (m <- TimeRe.findAllMatchIn(s)) {
      val sign = if (m.group(1) == "-") -1L else 1L
      val frac = Option(m.group(5)).map(f => (f + "0" * (6 - f.length)).toLong).getOrElse(0L)
      micros += sign * ((m.group(2).toLong * 3600L + m.group(3).toLong * 60L +
        m.group(4).toLong) * 1000000L + frac)
    }
    val noTime = TimeRe.replaceAllIn(s, " ")
    // fraction handling, measured against DuckDB 1.0 (r12 review fix —
    // rounding was wrong: '1.5 days' is '1 day 12:00:00', not '2 days'):
    // year-family units truncate to whole MONTHS and DISCARD the rest
    // ('1.55 years' = 18 months, no days); month/quarter cascade their
    // month-fraction to whole DAYS and discard the rest ('1.25 months' =
    // '1 month 7 days'); day/week cascade their day-fraction into micros
    // exactly ('1.5 weeks' = '10 days 12:00:00'); sub-day units are
    // exact micros. Truncation is toward zero ('-1.5 days' =
    // '-1 day -12:00:00').
    def addYearFam(totalMonths: Double): Unit = months += totalMonths.toLong
    def addMonthFam(totalMonths: Double): Unit = {
      val t = totalMonths.toLong
      months += t
      days += ((totalMonths - t) * 30).toLong
    }
    def addDayFam(totalDays: Double): Unit = {
      val t = totalDays.toLong
      days += t
      micros += math.round((totalDays - t) * 86400000000L)
    }
    for (m <- UnitRe.findAllMatchIn(noTime)) {
      val n = m.group(1).toDouble
      val u0 = m.group(2).toLowerCase(java.util.Locale.ROOT)
      val u = if (u0.length > 2 && u0.endsWith("s")) u0.dropRight(1) else u0
      u match {
        case "millennium" | "millennia" => addYearFam(n * 12000)
        case "century" | "centurie"     => addYearFam(n * 1200)
        case "decade"               => addYearFam(n * 120)
        case "year" | "yr"          => addYearFam(n * 12)
        case "quarter"              => addMonthFam(n * 3)
        case "month" | "mon"        => addMonthFam(n)
        case "week"                 => addDayFam(n * 7)
        case "day"                  => addDayFam(n)
        case "hour" | "hr"          => micros += math.round(n * 3600000000L)
        case "minute" | "min"       => micros += math.round(n * 60000000L)
        case "second" | "sec"       => micros += math.round(n * 1000000L)
        case "millisecond" | "ms"   => micros += math.round(n * 1000L)
        case "microsecond" | "us"   => micros += math.round(n)
        case other => throw new IllegalArgumentException(
          s"cannot parse interval '$s0': unknown unit '$other'")
      }
    }
    require(s.replaceAll("[\\s,]+", "").nonEmpty && {
      val stripped = TimeRe.replaceAllIn(s, "")
      UnitRe.replaceAllIn(stripped, "").replaceAll("[\\s,]+", "").isEmpty
    }, s"cannot parse interval '$s0'")
    (months, days, micros)
  }

  /** DuckDB's interval rendering (measured): signed unit words for
    * years/months/days, `HH:MM:SS[.ffffff]` (trailing zeros trimmed)
    * for the sub-day remainder, `00:00:00` when everything is zero. */
  def render(months: Long, days: Long, micros: Long): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val y = months / 12
    val m = months % 12
    if (y != 0) parts += s"$y year" + (if (math.abs(y) != 1) "s" else "")
    if (m != 0) parts += s"$m month" + (if (math.abs(m) != 1) "s" else "")
    if (days != 0) parts += s"$days day" + (if (math.abs(days) != 1) "s" else "")
    if (micros != 0 || parts.isEmpty) {
      val sign = if (micros < 0) "-" else ""
      val us = math.abs(micros)
      val h = us / 3600000000L
      val mi = (us % 3600000000L) / 60000000L
      val se = (us % 60000000L) / 1000000L
      val f = us % 1000000L
      val base = f"$sign$h%02d:$mi%02d:$se%02d"
      parts += (if (f == 0L) base
                else base + "." + f"$f%06d".reverse.dropWhile(_ == '0').reverse)
    }
    parts.mkString(" ")
  }
}
