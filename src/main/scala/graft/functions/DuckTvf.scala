package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** `unnest(e, recursive := true)`'s list flattener (r18 tvf
  * differential, measured DuckDB 1.0): nested lists flatten to the
  * INNERMOST element type at every depth, NULL sublists are skipped,
  * NULL leaf elements are kept (`[[1,NULL],[3]]` → 1, NULL, 3;
  * `[[1,2],NULL,[3]]` → 1, 2, 3; `[[[1],[2]],[[3]]]` → 1, 2, 3), and a
  * non-nested list is unchanged. A list of STRUCTs recursively expands
  * to columns in DuckDB — no Spark generator shape matches; refused
  * loudly.
  */
case class RecursiveFlatten(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private def innermost(t: DataType): DataType = t match {
    case ArrayType(et, _) => innermost(et)
    case other => other
  }

  override def dataType: DataType = child.dataType match {
    case a: ArrayType =>
      innermost(a) match {
        case _: StructType => throw new IllegalArgumentException(
          "unnest(recursive := true) over STRUCT elements expands to " +
            "columns in DuckDB — not supported here; unnest the list and " +
            "extract fields explicitly")
        case et => ArrayType(et, containsNull = true)
      }
    case other => throw new IllegalArgumentException(
      s"cannot recursively unnest a value of type ${other.sql}")
  }
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val out = ArrayBuffer.empty[Any]
    def walk(a: ArrayData, t: ArrayType): Unit = {
      var i = 0
      while (i < a.numElements()) {
        t.elementType match {
          case inner: ArrayType =>
            // a NULL sublist is skipped (measured), a NULL leaf kept
            if (!a.isNullAt(i)) walk(a.getArray(i), inner)
          case et =>
            out += (if (a.isNullAt(i)) null else a.get(i, et))
        }
        i += 1
      }
    }
    walk(v.asInstanceOf[ArrayData], child.dataType.asInstanceOf[ArrayType])
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): RecursiveFlatten =
    copy(child = c)
}

/** DuckDB `range(start, stop[, step])` — the HALF-OPEN series as a LIST
  * (r18 tvf differential, measured): stop is excluded (range(1,4) =
  * [1,2,3]), a crossed direction is DuckDB's loud Binder error ("start
  * is bigger than end, but increment is positive"), a zero step is
  * "interval cannot be 0!", and a NULL argument answers NULL (the
  * FROM-position explode of NULL is 0 rows, matching FROM
  * range(NULL, 5) = empty). Two flavors by the first child's type:
  * integral (BIGINT series) and timestamp (+ INTERVAL step, wall-clock
  * arithmetic via LocalDateTime so month steps honor the calendar).
  * The FROM-position INTEGER path keeps Spark's native lazy range TVF
  * (this expression materializes the list — fine for expression use,
  * wrong for `FROM range(1e9)`); only non-integer FROM ranges and
  * select-position calls land here.
  */
case class DuckRange(children: Seq[Expression], inclusive: Boolean = false)
    extends Expression with CodegenFallback {
  require(children.length == 2 || children.length == 3,
    "range(start, stop[, step])")

  private def timeFlavor: Boolean = children.head.dataType match {
    case TimestampNTZType | TimestampType | DateType => true
    case _ => false
  }

  override def dataType: DataType =
    if (timeFlavor) ArrayType(TimestampNTZType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    if (timeFlavor) {
      require(children.length == 3,
        "range() over timestamps needs an INTERVAL step")
      def toMicros(a: Any): Long = a match {
        case l: java.lang.Long => l.longValue // timestamp micros
        case i: java.lang.Integer => i.longValue * 86400000000L // DATE days
        case other => throw new IllegalArgumentException(
          s"range() timestamp bound expected, got $other")
      }
      val startUs = toMicros(vals(0))
      val stopUs = toMicros(vals(1))
      // the step arrives as whichever interval flavor the parser chose:
      // ANSI day-time (Long micros), ANSI year-month (Int months), or a
      // CalendarInterval triple (mixed literals via __graft_iv_make)
      val iv = children(2).dataType match {
        case CalendarIntervalType => vals(2).asInstanceOf[CalendarInterval]
        case _: DayTimeIntervalType =>
          new CalendarInterval(0, 0, vals(2).asInstanceOf[Long])
        case _: YearMonthIntervalType =>
          new CalendarInterval(vals(2).asInstanceOf[Int], 0, 0L)
        case other => throw new IllegalArgumentException(
          s"range() step over timestamps must be an INTERVAL, got ${other.sql}")
      }
      if (iv.months == 0 && iv.days == 0 && iv.microseconds == 0)
        throw new IllegalArgumentException("interval cannot be 0!")
      // DuckDB 1.0 (measured): a step with mixed-sign components (e.g.
      // INTERVAL '1 month' - INTERVAL '31 days') is a loud Invalid Input
      // error, never a direction guess — which also kills the
      // net-zero/net-negative "forward" loop this lexicographic check
      // used to fall into.
      val signs = Seq(iv.months.toLong, iv.days.toLong, iv.microseconds)
        .map(java.lang.Long.signum).filter(_ != 0)
      if (signs.contains(1) && signs.contains(-1))
        throw new IllegalArgumentException(
          "Interval with mix of negative/positive entries not supported")
      val forward = signs.head > 0
      if (forward && startUs > stopUs)
        throw new IllegalArgumentException(
          "start is bigger than end, but increment is positive: cannot generate infinite series")
      if (!forward && startUs < stopUs)
        throw new IllegalArgumentException(
          "start is smaller than end, but increment is negative: cannot generate infinite series")
      val out = ArrayBuffer.empty[Any]
      var t = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(startUs, 1000000L), (Math.floorMod(startUs, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      def toUs(x: java.time.LocalDateTime): Long =
        x.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + x.getNano / 1000L
      var us = startUs
      while (if (forward) { if (inclusive) us <= stopUs else us < stopUs }
             else { if (inclusive) us >= stopUs else us > stopUs }) {
        out += us
        t = t.plusMonths(iv.months.toLong).plusDays(iv.days.toLong)
          .plusNanos(iv.microseconds * 1000L)
        val next = toUs(t)
        // defense in depth: every calendar step must strictly advance
        // toward stop or the loop would allocate unboundedly
        if (if (forward) next <= us else next >= us)
          throw new IllegalStateException(
            s"range() interval step did not advance ($us -> $next)")
        us = next
      }
      new GenericArrayData(out.toArray)
    } else {
      def asLong(a: Any): Long = a match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long => l.longValue
        case s: java.lang.Short => s.longValue
        case b: java.lang.Byte => b.longValue
        case d: Decimal => d.toLong
        case other => throw new IllegalArgumentException(
          s"range() bound must be integral, got $other")
      }
      val start = asLong(vals(0))
      val stop = asLong(vals(1))
      val step = if (children.length == 3) asLong(vals(2)) else 1L
      if (step == 0) throw new IllegalArgumentException("interval cannot be 0!")
      if (step > 0 && start > stop)
        throw new IllegalArgumentException(
          "start is bigger than end, but increment is positive: cannot generate infinite series")
      if (step < 0 && start < stop)
        throw new IllegalArgumentException(
          "start is smaller than end, but increment is negative: cannot generate infinite series")
      val out = ArrayBuffer.empty[Any]
      var x = start
      while (if (step > 0) { if (inclusive) x <= stop else x < stop }
             else { if (inclusive) x >= stop else x > stop }) {
        out += x; x += step
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckRange =
    copy(children = newChildren)
}
