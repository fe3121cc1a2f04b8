package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's infix `x GLOB 'pattern'` — BYTE-wise glob match (r16
  * likeglob barrage, all rules measured on DuckDB 1.0.0):
  *
  *  - `*` any byte sequence (consecutive stars collapse), `?` exactly
  *    ONE byte (`'héllo' GLOB 'h?llo'` is false — é is two bytes),
  *    `\` escapes the next pattern byte to a literal;
  *  - `[...]` byte classes: leading `!` negates, a `]` directly after
  *    the opening `[`/`[!` is a literal member, `a-z` ranges compare
  *    bytes, and `-` before the closing `]` is consumed as a RANGE to
  *    `]` (so `[a-]` can never close: measured to match nothing);
  *  - an unterminated class makes the whole pattern match NOTHING
  *    (measured `'a[' GLOB 'a['` = false);
  *  - case-sensitive throughout; NULL in → NULL out.
  *
  * Matching is iterative star-backtracking (O(s·p)), no regex engine.
  * Reference surface: pass-through SQL at ducklakexl.py:394.
  */
object DuckGlob {
  /** -2 = unterminated class; -1 = no match; else next pattern index */
  private def matchClass(b: Byte, p: Array[Byte], start: Int): Int = {
    var j = start + 1
    var neg = false
    if (j < p.length && p(j) == '!') { neg = true; j += 1 }
    var matched = false
    var first = true
    while (j < p.length) {
      if (p(j) == ']' && !first) {
        return if (matched != neg) j + 1 else -1
      }
      first = false
      if (j + 2 < p.length && p(j + 1) == '-') {
        // a range consumes its endpoint even when that endpoint is ']'
        val lo = p(j) & 0xFF; val hi = p(j + 2) & 0xFF
        if ((b & 0xFF) >= lo && (b & 0xFF) <= hi) matched = true
        j += 3
      } else {
        if (p(j) == b) matched = true
        j += 1
      }
    }
    -2 // never closed: the pattern matches nothing at all
  }

  def matches(sU: UTF8String, pU: UTF8String): Boolean = {
    val s = sU.getBytes
    val p = pU.getBytes
    var si = 0; var pi = 0
    var starPi = -1; var starSi = -1
    while (si < s.length) {
      var stepped = false
      if (pi < p.length) {
        (p(pi): @annotation.switch) match {
          case '*' =>
            while (pi < p.length && p(pi) == '*') pi += 1
            starPi = pi; starSi = si
            stepped = true
          case '?' =>
            si += 1; pi += 1; stepped = true
          case '[' =>
            matchClass(s(si), p, pi) match {
              case -2 => return false
              case -1 => // fall through to star backtrack
              case next => si += 1; pi = next; stepped = true
            }
          case '\\' =>
            if (pi + 1 < p.length && p(pi + 1) == s(si)) {
              si += 1; pi += 2; stepped = true
            }
          case c =>
            if (c == s(si)) { si += 1; pi += 1; stepped = true }
        }
      }
      if (!stepped) {
        if (starPi < 0) return false
        starSi += 1
        si = starSi
        pi = starPi
      }
    }
    while (pi < p.length && p(pi) == '*') pi += 1
    pi == p.length
  }
}

/** `str GLOB pat` — see [[DuckGlob]] */
case class DuckGlobMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "glob"
  override def nullSafeEval(s: Any, p: Any): Any =
    DuckGlob.matches(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) =>
      s"${ev.value} = graft.functions.DuckGlob.matches($s, $p);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckGlobMatch =
    copy(left = l, right = r)
}
