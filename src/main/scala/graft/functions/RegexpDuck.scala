package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB regexp options + RE2 surface Spark's builtins cannot twin
  * (measured on REAL DuckDB 1.0 — r13 regexp differential barrage):
  *
  *  - option letters: `i` case-insensitive, `s` dot-matches-newline,
  *    `c` case-sensitive (the default), `g` global (replace only),
  *    `l` literal, and `m`/`n`/`p` "newline-sensitive" — which in 1.0
  *    does NOT turn on multiline `^`/`$` anchors (measured:
  *    `regexp_matches('foo\nbar', '^bar$', 'm')` is FALSE), so m/n/p
  *    map to Java's default behavior and simply drop;
  *  - POSIX classes `[[:upper:]]` are RE2 syntax Java silently
  *    mis-parses as a nested class (measured wrong-value, not an
  *    error): translated to Java's `\p{Upper}` family at compile;
  *  - `regexp_matches` is find-anywhere, `regexp_full_match` anchors
  *    the whole string;
  *  - replacement backrefs are `\1` (RE2), translated to Java `$1` by
  *    [[RegexpFirst.translateReplacement]]; 4-arg replace without `g`
  *    replaces the FIRST match only.
  */
object RegexpDuck {
  private val Posix = Map(
    "alpha" -> "\\p{Alpha}", "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}",
    "digit" -> "\\p{Digit}", "alnum" -> "\\p{Alnum}", "space" -> "\\p{Space}",
    "punct" -> "\\p{Punct}", "xdigit" -> "\\p{XDigit}", "cntrl" -> "\\p{Cntrl}",
    "blank" -> "\\p{Blank}", "graph" -> "\\p{Graph}", "print" -> "\\p{Print}",
    "word" -> "\\w")

  def translatePosix(p: String): String = {
    var out = p
    Posix.foreach { case (name, jav) =>
      out = out.replace(s"[:$name:]", jav)
    }
    out
  }

  private def javaFlags(flags: String): Int = {
    var f = 0
    flags.foreach {
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 's' => f |= Pattern.DOTALL
      case 'l' => f |= Pattern.LITERAL
      case 'c' | 'm' | 'n' | 'p' | 'g' => // measured no-ops vs Java defaults
      case other => throw new IllegalArgumentException(
        s"unsupported regexp option '$other' (DuckDB options: cgilmnps)")
    }
    f
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Pattern]()

  def compile(p: String, flags: String): Pattern = {
    if (cache.size > 1024) cache.clear()
    cache.computeIfAbsent((p, flags), { case (pp, ff) =>
      val body = if (ff.contains('l')) pp else translatePosix(pp)
      Pattern.compile(body, javaFlags(ff))
    })
  }

  def matches(s: UTF8String, p: UTF8String, flags: UTF8String, full: Boolean): Boolean = {
    val m = compile(p.toString, flags.toString).matcher(s.toString)
    if (full) m.matches() else m.find()
  }

  def replace(s: UTF8String, p: UTF8String, r: UTF8String, flags: UTF8String): UTF8String = {
    val f = flags.toString
    val m = compile(p.toString, f).matcher(s.toString)
    val rep = RegexpFirst.translateReplacement(r.toString)
    UTF8String.fromString(if (f.contains('g')) m.replaceAll(rep) else m.replaceFirst(rep))
  }
}

/** `__graft_regexp_matches(s, p, 'flags')` / `__graft_regexp_full_match` */
case class RegexpMatchesDuck(first: Expression, second: Expression,
                             third: Expression, full: Boolean)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)
  override def prettyName: String =
    if (full) "regexp_full_match" else "regexp_matches"
  override def nullSafeEval(s: Any, p: Any, f: Any): Any =
    RegexpDuck.matches(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String], full)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, f) =>
      s"${ev.value} = graft.functions.RegexpDuck.matches($s, $p, $f, $full);")
  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression): RegexpMatchesDuck =
    copy(first = f1, second = f2, third = f3)
}

/** `__graft_regexp_replace(s, p, r, 'flags')` — first-match unless 'g' */
case class RegexpReplaceDuck(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType, StringType)
  override def prettyName: String = "regexp_replace"
  override def nullSafeEval(s: Any, p: Any, r: Any, f: Any): Any =
    RegexpDuck.replace(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, r, f) =>
      s"${ev.value} = graft.functions.RegexpDuck.replace($s, $p, $r, $f);")
  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression, f4: Expression): RegexpReplaceDuck =
    copy(first = f1, second = f2, third = f3, fourth = f4)
}
