package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.IsoFields

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-exact strftime/strptime (r16 differential barrage — every rule
  * below MEASURED on DuckDB 1.0.0; reference surface reachable through
  * `ducklakexl.py:394`). The previous implementation translated C
  * directives into Java date_format patterns, which cannot express
  * %w/%u/%U/%W/%V/%G/%n/%z/%-y at all and silently diverges on others —
  * exactly the bug class the r13-r15 barrages kept finding. This native
  * formats/parses directly from the measured table instead:
  *
  * format (strftime):
  *  - names are locale-free English: %a Tue / %A Tuesday / %b Mar /
  *    %h = %b / %B March; %p AM/PM.
  *  - %w Sunday=0..6, %u ISO Monday=1..7.
  *  - %Y pads non-negative years to 4 ('0044') but renders negatives
  *    unpadded ('-500'); %G same for the ISO week-based year.
  *  - %y zero-padded year%100, %-y unpadded ('3' for 2003).
  *  - %U Sunday-start week 00-53, %W Monday-start, %V ISO week.
  *  - %g is MILLISECOND (3), %f MICROSECOND (6), %n NANOSECOND (9) —
  *    not the C meanings.
  *  - %z is '+00' and %Z '' under the pinned-UTC session.
  *  - %x = %Y-%m-%d, %X = %T = %H:%M:%S, %c = '%Y-%m-%d %H:%M:%S'.
  *  - a '-' flag suppresses zero padding; unsupported directives
  *    (%e %D %R %s %C ...) are LOUD errors, as there.
  *
  * parse (strptime):
  *  - numeric directives skip leading whitespace and consume 1..maxw
  *    digits (maxw: %Y 4, %j/%g 3, %f 6, %n 9, others 2); literal
  *    characters must match exactly; trailing input whitespace is
  *    tolerated, any other unconsumed input is an error.
  *  - missing fields default to 1900-01-01 00:00:00.
  *  - parse-time ranges: %m 1-12, %d 1-31, %H 0-23, %I 1-12, %M/%S
  *    0-59, %j 1-366 — violations are parse errors ("Could not parse
  *    string ..."); a day out of range for its month is a separate
  *    "Date out of range" conversion error (both NULL under try_).
  *  - %y pivots at 69: 68 -> 2068, 69 -> 1969.
  *  - %a/%A and %U/%W/%V/%w/%u values are validated-then-IGNORED, and
  *    %j is range-checked but does NOT move the date (measured:
  *    strptime('2024-066','%Y-%j') = 2024-01-01).
  *  - %f/%g are integer micro/millisecond VALUES ('1' -> .000001).
  *  - month/day names and %p match case-insensitively.
  *  - %z (+01, +0130, +01:30) shifts the wall time to a UTC instant;
  *    the router wraps such calls (and list-format calls) in the tstz
  *    tag because DuckDB types them TIMESTAMP WITH TIME ZONE.
  *  - a LIST format tries each entry in order (first success wins).
  */
object StrfDuck {
  private sealed trait Tok
  private final case class TLit(s: String) extends Tok
  private final case class TSpec(c: Char, noPad: Boolean) extends Tok

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[Tok]]()

  private val DayAbbrev = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val DayFull = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")
  private val MonAbbrev = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val MonFull = Array("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")

  private val Supported = "aAwudbhBmyYGHIpMSgfnjUWVxXcTzZ%"

  private def compile(fmt: String): Array[Tok] = {
    val hit = cache.get(fmt)
    if (hit != null) return hit
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) { toks += TLit(lit.toString); lit.clear() }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        var j = i + 1
        val noPad = fmt.charAt(j) == '-' && j + 1 < fmt.length
        if (noPad) j += 1
        val c = fmt.charAt(j)
        if (!Supported.contains(c)) throw new IllegalArgumentException(
          s"Failed to parse format specifier %${if (noPad) "-" else ""}$c: " +
            "unsupported specifier")
        flush()
        c match { // composites expand at compile time (measured renders)
          case 'x' =>
            toks += TSpec('Y', noPad = false); toks += TLit("-")
            toks += TSpec('m', noPad = false); toks += TLit("-")
            toks += TSpec('d', noPad = false)
          case 'X' | 'T' =>
            toks += TSpec('H', noPad = false); toks += TLit(":")
            toks += TSpec('M', noPad = false); toks += TLit(":")
            toks += TSpec('S', noPad = false)
          case 'c' =>
            toks += TSpec('Y', noPad = false); toks += TLit("-")
            toks += TSpec('m', noPad = false); toks += TLit("-")
            toks += TSpec('d', noPad = false); toks += TLit(" ")
            toks += TSpec('H', noPad = false); toks += TLit(":")
            toks += TSpec('M', noPad = false); toks += TLit(":")
            toks += TSpec('S', noPad = false)
          case '%' => lit.append('%')
          case other => toks += TSpec(other, noPad)
        }
        i = j + 1
      } else { lit.append(fmt.charAt(i)); i += 1 }
    }
    flush()
    val arr = toks.toArray
    if (cache.size < 1024) cache.put(fmt, arr)
    arr
  }

  private def pad(n: Long, w: Int, noPad: Boolean): String =
    if (noPad) n.toString
    else {
      val s = math.abs(n).toString
      val p = if (s.length >= w) s else "0" * (w - s.length) + s
      if (n < 0) "-" + p else p
    }

  def format(micros: Long, fmt: String): UTF8String = {
    val toks = compile(fmt)
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC)
    val iso = ldt.getDayOfWeek.getValue // Mon=1..Sun=7
    val sb = new StringBuilder
    toks.foreach {
      case TLit(s) => sb.append(s)
      case TSpec(c, noPad) => c match {
        case 'a' => sb.append(DayAbbrev(iso - 1))
        case 'A' => sb.append(DayFull(iso - 1))
        case 'w' => sb.append(iso % 7)
        case 'u' => sb.append(iso)
        case 'd' => sb.append(pad(ldt.getDayOfMonth, 2, noPad))
        case 'b' | 'h' => sb.append(MonAbbrev(ldt.getMonthValue - 1))
        case 'B' => sb.append(MonFull(ldt.getMonthValue - 1))
        case 'm' => sb.append(pad(ldt.getMonthValue, 2, noPad))
        case 'y' => sb.append(pad(Math.floorMod(ldt.getYear, 100), 2, noPad))
        case 'Y' =>
          val y = ldt.getYear
          sb.append(if (y < 0) y.toString else pad(y, 4, noPad))
        case 'G' =>
          val g = ldt.get(IsoFields.WEEK_BASED_YEAR)
          sb.append(if (g < 0) g.toString else pad(g, 4, noPad))
        case 'H' => sb.append(pad(ldt.getHour, 2, noPad))
        case 'I' =>
          val h = ldt.getHour % 12
          sb.append(pad(if (h == 0) 12 else h, 2, noPad))
        case 'p' => sb.append(if (ldt.getHour < 12) "AM" else "PM")
        case 'M' => sb.append(pad(ldt.getMinute, 2, noPad))
        case 'S' => sb.append(pad(ldt.getSecond, 2, noPad))
        case 'g' => sb.append(pad(frac / 1000, 3, noPad))
        case 'f' => sb.append(pad(frac, 6, noPad))
        case 'n' => sb.append(pad(frac * 1000, 9, noPad))
        case 'j' => sb.append(pad(ldt.getDayOfYear, 3, noPad))
        case 'U' => // Sunday-start week number (C semantics, measured)
          sb.append(pad((ldt.getDayOfYear - 1 + 7 - (iso % 7)) / 7, 2, noPad))
        case 'W' => // Monday-start
          sb.append(pad((ldt.getDayOfYear - 1 + 7 - (iso - 1)) / 7, 2, noPad))
        case 'V' => sb.append(pad(ldt.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR), 2, noPad))
        case 'z' => sb.append("+00")
        case 'Z' => ()
        case other => throw new IllegalStateException(s"unreachable: %$other")
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private final class ParseFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** parse one format against the input; Long micros on success */
  private def parseOne(s: String, toks: Array[Tok]): Long = {
    val fail = new ParseFail
    var pos = 0
    var year = 1900; var month = 1; var day = 1
    var hour = 0; var hour12 = -1; var pm = -1
    var minute = 0; var second = 0; var fracMicros = 0L
    var offsetSecs = 0L; var sawTz = false
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def num(maxw: Int): Int = {
      skipWs()
      var v = 0; var n = 0
      while (n < maxw && pos < s.length && s.charAt(pos).isDigit) {
        v = v * 10 + (s.charAt(pos) - '0'); pos += 1; n += 1
      }
      if (n == 0) throw fail
      v
    }
    def name(cands: Array[String]): Int = {
      skipWs()
      var best = -1; var bestLen = 0
      var i = 0
      while (i < cands.length) {
        val c = cands(i)
        if (c.length > bestLen && pos + c.length <= s.length &&
            s.regionMatches(true, pos, c, 0, c.length)) { best = i; bestLen = c.length }
        i += 1
      }
      if (best < 0) throw fail
      pos += bestLen
      best
    }
    toks.foreach {
      case TLit(t) =>
        var i = 0
        while (i < t.length) {
          if (pos >= s.length || s.charAt(pos) != t.charAt(i)) throw fail
          pos += 1; i += 1
        }
      case TSpec(c, _) => c match {
        case 'Y' => year = num(4)
        case 'y' =>
          val v = num(2)
          year = if (v <= 68) 2000 + v else 1900 + v
        case 'G' => num(4) // parsed, ignored (like %j — measured)
        case 'm' =>
          month = num(2); if (month < 1 || month > 12) throw fail
        case 'd' =>
          day = num(2); if (day < 1 || day > 31) throw fail
        case 'b' | 'h' => month = name(MonAbbrev) + 1
        case 'B' => month = name(MonFull) + 1
        case 'a' => name(DayAbbrev) // validated, ignored
        case 'A' => name(DayFull)
        case 'H' =>
          hour = num(2); if (hour > 23) throw fail
        case 'I' =>
          hour12 = num(2); if (hour12 < 1 || hour12 > 12) throw fail
        case 'p' =>
          skipWs()
          if (pos + 2 > s.length) throw fail
          val t = s.substring(pos, pos + 2)
          if (t.equalsIgnoreCase("AM")) pm = 0
          else if (t.equalsIgnoreCase("PM")) pm = 1
          else throw fail
          pos += 2
        case 'M' =>
          minute = num(2); if (minute > 59) throw fail
        case 'S' =>
          second = num(2); if (second > 59) throw fail
        case 'f' => fracMicros = num(6)
        case 'g' => fracMicros = num(3) * 1000L
        case 'n' => fracMicros = num(9) / 1000L
        case 'j' =>
          val v = num(3); if (v < 1 || v > 366) throw fail // ignored
        case 'U' | 'W' | 'V' =>
          val v = num(2); if (v > 53) throw fail // ignored
        case 'w' | 'u' => num(1) // ignored
        case 'z' =>
          skipWs()
          if (pos >= s.length) throw fail
          val sign = s.charAt(pos) match {
            case '+' => 1L
            case '-' => -1L
            case _ => throw fail
          }
          pos += 1
          val hh = num(2)
          var mm = 0
          if (pos < s.length && s.charAt(pos) == ':') { pos += 1; mm = num(2) }
          else if (pos < s.length && s.charAt(pos).isDigit) mm = num(2)
          offsetSecs = sign * (hh * 3600L + mm * 60L)
          sawTz = true
        case 'Z' => () // matches nothing under the pinned-UTC session
        case other => throw new IllegalArgumentException(
          s"Failed to parse format specifier %$other: unsupported specifier")
      }
    }
    skipWs()
    if (pos != s.length) throw fail
    if (hour12 >= 0) hour = (hour12 % 12) + (if (pm == 1) 12 else 0)
    val date =
      try LocalDate.of(year, month, day)
      catch { case _: java.time.DateTimeException =>
        throw new ArithmeticException(s"Conversion Error: Date out of range: $year-$month-$day")
      }
    val micros = date.toEpochDay * 86400000000L +
      (hour * 3600L + minute * 60L + second) * 1000000L + fracMicros
    if (sawTz) micros - offsetSecs * 1000000L else micros
  }

  /** fmts: one or more formats (first parse wins). Returns Long micros,
    * null under tryMode, else throws the measured error text. */
  def parse(s: String, fmts: Array[String], tryMode: Boolean): Any = {
    var i = 0
    var outOfRange: ArithmeticException = null
    while (i < fmts.length) {
      try return parseOne(s, compile(fmts(i)))
      catch {
        case _: ParseFail => ()
        case e: ArithmeticException => outOfRange = e // date out of range
      }
      i += 1
    }
    if (tryMode) null
    else if (outOfRange != null) throw outOfRange
    else throw new IllegalArgumentException(
      s"""Could not parse string "$s" according to format specifier "${fmts.mkString(",")}"""")
  }

  def parse1(s: UTF8String, fmt: UTF8String, tryMode: Boolean): Any =
    parse(s.toString, Array(fmt.toString), tryMode)
}

/** `strftime(ts_or_date, fmt)` — see [[StrfDuck]] */
case class DuckStrftime(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strftime"
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case TimestampType | TimestampNTZType | DateType | NullType =>
      if (right.dataType == StringType || right.dataType == NullType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"strftime format must be VARCHAR, got ${right.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      // measured: DuckDB has no strftime(TIME, VARCHAR) binding either
      s"No function matches strftime(${other.simpleString}, VARCHAR)")
  }
  private def toMicros(v: Any): Long = left.dataType match {
    case DateType => v.asInstanceOf[Number].longValue() * 86400000000L
    case _ => v.asInstanceOf[Number].longValue()
  }
  override def nullSafeEval(t: Any, f: Any): Any =
    StrfDuck.format(toMicros(t), f.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toM = left.dataType match {
      case DateType => (c: String) => s"((long)($c)) * 86400000000L"
      case _ => (c: String) => s"(long)($c)"
    }
    nullSafeCodeGen(ctx, ev, (t, f) =>
      s"${ev.value} = graft.functions.StrfDuck.format(${toM(t)}, $f.toString());")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckStrftime =
    copy(left = l, right = r)
}

/** `strptime(s, fmt_or_list)` / `try_strptime` — see [[StrfDuck]] */
case class DuckStrptime(left: Expression, right: Expression, tryMode: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = if (tryMode) "try_strptime" else "strptime"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType | NullType, StringType | NullType) => TypeCheckResult.TypeCheckSuccess
      case (StringType | NullType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"No function matches strptime(${l.simpleString}, ${r.simpleString})")
    }
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input); if (s == null) return null
    val f = right.eval(input); if (f == null) return null
    val fmts = right.dataType match {
      case ArrayType(_, _) =>
        val a = f.asInstanceOf[ArrayData]
        Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
      case _ => Array(f.toString)
    }
    StrfDuck.parse(s.toString, fmts, tryMode)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, f) => {
      val call = right.dataType match {
        case ArrayType(_, _) =>
          s"""String[] __fm = new String[$f.numElements()];
             |for (int __i = 0; __i < __fm.length; __i++)
             |  __fm[__i] = $f.getUTF8String(__i).toString();
             |Object __sp = graft.functions.StrfDuck.parse($s.toString(), __fm, $tryMode);""".stripMargin
        case _ =>
          s"Object __sp = graft.functions.StrfDuck.parse1($s, $f, $tryMode);"
      }
      s"""$call
         |if (__sp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) __sp).longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckStrptime =
    copy(left = l, right = r)
}
