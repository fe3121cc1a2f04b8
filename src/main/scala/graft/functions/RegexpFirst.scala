package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's 3-arg `regexp_replace(s, re, rep)` replaces the FIRST match
  * only (the 'g' flag opts into global), while Spark's built-in always
  * replaces all — no composition of Spark built-ins carries
  * backreference replacement semantics for the first-only form, so this
  * is the "(b) custom Expression" rung. Registered as a SQL function by
  * the lake (`__graft_regexp_replace_first`), targeted by the dialect
  * rewrite of 3-arg calls. Replacement backrefs use DuckDB's `\\1`
  * spelling, translated to Java's `$1`; a literal `$` is quoted.
  */
object RegexpFirst {
  // pattern cache: the pattern is almost always a literal (one entry);
  // bounded so a pathological per-row pattern column cannot grow it
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  def replaceFirst(s: UTF8String, p: UTF8String, r: UTF8String): UTF8String = {
    if (cache.size > 1024) cache.clear()
    val pat = cache.computeIfAbsent(p.toString, java.util.regex.Pattern.compile(_))
    UTF8String.fromString(
      pat.matcher(s.toString).replaceFirst(translateReplacement(r.toString)))
  }

  /** DuckDB (RE2-style) replacement text -> Java Matcher replacement:
    * `\\N` group refs become `$N`, `\\\\` stays a literal backslash,
    * a bare `$` is quoted (it would be a Java group ref otherwise) */
  private[functions] def translateReplacement(r: String): String = {
    val sb = new StringBuilder(r.length + 4)
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n.isDigit) { sb.append('$').append(n); i += 2 }
        else if (n == '\\') { sb.append("\\\\"); i += 2 }
        else { sb.append('\\').append(n); i += 2 } // \x -> literal x (Java rule)
      } else if (c == '$') { sb.append("\\$"); i += 1 }
      else if (c == '\\') { sb.append("\\\\"); i += 1 } // trailing backslash
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

case class RegexpReplaceFirst(subject: Expression, pattern: Expression,
                              replacement: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = replacement
  override def dataType: DataType = StringType
  // DuckDB implicitly casts a non-string subject (e.g. an INT routed
  // through the 3-arg rewrite); without declared input types that call
  // reached nullSafeEval and died with a ClassCastException at runtime.
  // (Seq[DataType] is a covariant override of Seq[AbstractDataType] —
  // AbstractDataType itself is private[sql] and cannot be named here.)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def nullSafeEval(s: Any, p: Any, r: Any): Any =
    RegexpFirst.replaceFirst(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, r) =>
      s"${ev.value} = graft.functions.RegexpFirst.replaceFirst($s, $p, $r);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RegexpReplaceFirst =
    copy(subject = newFirst, pattern = newSecond, replacement = newThird)
}
