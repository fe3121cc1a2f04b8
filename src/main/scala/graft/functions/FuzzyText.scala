package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler similarity — DuckDB's fuzzy-match pair
  * (`jaro_similarity` / `jaro_winkler_similarity`, r14 function-battery
  * gap; Spark ships neither). Standard definitions: match window
  * max(|a|,|b|)/2 - 1, transpositions halved; Winkler adds the common-
  * prefix boost (up to 4 chars, scaling 0.1). Measured parity:
  * jaro_winkler_similarity('duck','luck') = 0.8333333333333334.
  */
case class JaroSimilarity(left: Expression, right: Expression, winkler: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (winkler) "jaro_winkler_similarity" else "jaro_similarity"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("jaro takes two strings")
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val jaro = JaroSimilarity.jaro(a, b)
    if (!winkler) jaro
    else {
      val maxPrefix = math.min(4, math.min(a.length, b.length))
      var p = 0
      while (p < maxPrefix && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
}

object JaroSimilarity {
  private[functions] def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2.0) / m) / 3.0
  }
}

/** DuckDB's `format_bytes` — binary units with one decimal past KiB
  * ('1023 bytes', '1.5 KiB', '9.0 TiB' — measured) */
case class FormatBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "format_bytes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"format_bytes takes an integer, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val n = v match {
      case b: Byte => b.toLong; case s: Short => s.toLong
      case i: Int => i.toLong; case l: Long => l
    }
    val neg = n < 0
    val abs = math.abs(n.toDouble)
    val units = Seq("KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
    val s =
      if (abs < 1024) s"${math.abs(n)} bytes"
      else {
        var x = abs / 1024.0
        var u = 0
        while (x >= 1024.0 && u < units.length - 1) { x /= 1024.0; u += 1 }
        // DuckDB TRUNCATES the single decimal (9.0949 TiB -> '9.0 TiB')
        val t = math.floor(x * 10.0) / 10.0
        f"$t%.1f ${units(u)}"
      }
    UTF8String.fromString((if (neg) "-" else "") + s)
  }
  override protected def withNewChildInternal(c: Expression): FormatBytes =
    copy(child = c)
}
