package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-exact upper/lower/accent-strip (r15 COLLATE + Unicode barrage).
  *
  * DuckDB cases text with utf8proc's SIMPLE (1:1) per-code-point mapping;
  * Spark's built-ins use the JVM's FULL mapping, which expands
  * (`upper('ß') = 'SS'`, `lower('İ') = "i̇"`) — silently different
  * values for everyday German/Turkish text. MEASURED divergence between
  * `Character.toUpperCase/toLowerCase` (JDK 17) and DuckDB 1.0.0 across
  * ALL code points U+0001..U+2FFFF: exactly 7 entries (tools probe,
  * r15) — ß upper-cases to ẞ in utf8proc, and six Latin Extended-D
  * letters added in a Unicode version the two tables disagree on
  * (U+A7C7-U+A7CA, U+A7F5/U+A7F6) where DuckDB maps to self. Everything
  * else agrees, so the implementation is the JDK simple mapping plus a
  * 7-entry override table.
  *
  * NOACCENT strips combining marks: NFD-decompose, drop NON_SPACING_MARK,
  * NFC-recompose — measured equal to DuckDB's behavior ('é'='e', 'ñ'='n',
  * 'ě'='e'; 'ø'/'đ' have no decomposition and keep their stroke, exactly
  * as DuckDB keeps them unequal to 'o'/'d').
  */
object DuckCase {
  // measured utf8proc-vs-JDK divergence (see Scaladoc): cp -> mapped cp
  private val upperOverride: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    m.put(0x00DF, 0x1E9E) // ß -> ẞ (utf8proc; JDK simple keeps ß)
    m.put(0xA7C8, 0xA7C8); m.put(0xA7CA, 0xA7CA); m.put(0xA7F6, 0xA7F6)
    m
  }
  private val lowerOverride: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    m.put(0xA7C7, 0xA7C7); m.put(0xA7C9, 0xA7C9); m.put(0xA7F5, 0xA7F5)
    m
  }

  private def mapCase(s: UTF8String, upper: Boolean): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val over = if (upper) upperOverride.get(cp) else lowerOverride.get(cp)
      val mapped =
        if (over != null) over.intValue()
        else if (upper) Character.toUpperCase(cp)
        else Character.toLowerCase(cp)
      sb.appendCodePoint(mapped)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def duckUpper(s: UTF8String): UTF8String = mapCase(s, upper = true)
  def duckLower(s: UTF8String): UTF8String = mapCase(s, upper = false)
  private[functions] def mapCasePublic(s: UTF8String, upper: Boolean): UTF8String =
    mapCase(s, upper)

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** `__graft_upper` / `__graft_lower` — see [[DuckCase]] */
case class DuckCaseMap(child: Expression, upper: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    DuckCase.mapCasePublic(input.asInstanceOf[UTF8String], upper)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (upper) s"${ev.value} = graft.functions.DuckCase.duckUpper($c);"
      else s"${ev.value} = graft.functions.DuckCase.duckLower($c);")
  override protected def withNewChildInternal(newChild: Expression): DuckCaseMap =
    copy(child = newChild)
}

/** `__graft_nfc` — the NFC collation key (DuckDB's NFC collation
  * compares normalized forms) */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    DuckCase.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DuckCase.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `__graft_noaccent` — see [[DuckCase]] */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    DuckCase.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DuckCase.stripAccents($c);")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}
