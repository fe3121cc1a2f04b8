package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB JSON accessor semantics (measured on REAL DuckDB 1.0 — r13
  * JSON differential barrage; reference surface reachable through
  * `ducklakexl.py:394`), which Spark's `get_json_object` cannot twin:
  *
  *  - three path spellings share one rule: `$`-prefixed JSONPath-lite
  *    (`$.key`, `$."quoted key"`, `$[i]`, `$.c[#-1]` from-end), a
  *    `/`-prefixed JSON Pointer (`/a/b/0`, `~0`/`~1` escapes), and
  *    anything else is a SINGLE top-level key — `'a.b'` is the key
  *    "a.b", never a dotted traversal (measured; get_json_object's
  *    dotted-path coercion was the r13 divergence);
  *  - a bare all-digit key applied to an array is a 0-based index;
  *  - `json_extract`/`->` return JSON TEXT: string leaves KEEP their
  *    quotes (`"x"`), objects/arrays serialize compactly (`{"a":1}`);
  *  - `json_extract_string`/`->>` unquote string leaves;
  *  - a JSON `null` leaf is SQL NULL through both;
  *  - a missing path is SQL NULL; malformed JSON is a loud error
  *    ("Malformed JSON"), not NULL;
  *  - `json_array_length(j[, path])`: array -> size, present non-array
  *    -> 0, missing path -> NULL.
  *
  * CodegenFallback matches Spark's own JSON expression family
  * (GetJsonObject is eval-only too); the JSON hot path at scale is the
  * scan, not the accessor.
  */
object DuckJsonPath {
  // trailing content after the first value is malformed in DuckDB
  // (`json_valid('{"a":1}{')` measured false) — Jackson accepts it
  // unless told otherwise
  private val mapper = new ObjectMapper().enable(
    com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  sealed trait Seg
  final case class Key(k: String) extends Seg
  final case class Idx(i: Int) extends Seg
  final case class FromEnd(i: Int) extends Seg

  def parse(json: String): JsonNode = {
    val node =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"Malformed JSON: ${e.getMessage}") }
    // readTree returns MissingNode on empty input instead of throwing
    if (node == null || node.isMissingNode)
      throw new IllegalArgumentException("Malformed JSON: empty input")
    node
  }

  /** path string -> segments (DuckDB 1.0 rules above) */
  def segments(path: String): Seq[Seg] = {
    if (path.isEmpty) throw new IllegalArgumentException("Empty JSON path")
    if (path.startsWith("$")) {
      val out = Seq.newBuilder[Seg]
      var i = 1
      while (i < path.length) {
        path.charAt(i) match {
          case '.' =>
            i += 1
            if (i < path.length && path.charAt(i) == '"') {
              val end = path.indexOf('"', i + 1)
              require(end > 0, s"Unterminated quoted key in JSON path: $path")
              out += Key(path.substring(i + 1, end)); i = end + 1
            } else {
              var j = i
              while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[') j += 1
              require(j > i, s"Empty key in JSON path: $path")
              out += Key(path.substring(i, j)); i = j
            }
          case '[' =>
            val end = path.indexOf(']', i)
            require(end > 0, s"Unterminated [ in JSON path: $path")
            val body = path.substring(i + 1, end).trim
            if (body.startsWith("#-")) out += FromEnd(body.drop(2).trim.toInt)
            else if (body.forall(_.isDigit) && body.nonEmpty) out += Idx(body.toInt)
            else if (body.startsWith("-") && body.drop(1).forall(_.isDigit))
              out += Idx(body.toInt) // negative plain index: measured NULL
            else throw new IllegalArgumentException(
              s"Unsupported JSON path element [$body] (wildcards return lists " +
              "in DuckDB — not supported here)")
            i = end + 1
          case c => throw new IllegalArgumentException(
            s"Unsupported JSON path syntax at '$c' in: $path")
        }
      }
      out.result()
    } else if (path.startsWith("/")) {
      path.split("/").toSeq.drop(1).map { raw =>
        val k = raw.replace("~1", "/").replace("~0", "~")
        Key(k)
      }
    } else Seq(Key(path))
  }

  /** one step; Key on an array with an all-digit name is an index
    * (measured: `'[5,6]' -> '1'` = 6) */
  private def step(node: JsonNode, seg: Seg): JsonNode = seg match {
    case Key(k) =>
      if (node.isObject) node.get(k)
      else if (node.isArray && k.nonEmpty && k.forall(_.isDigit)) node.get(k.toInt)
      else null
    case Idx(i) => if (node.isArray && i >= 0) node.get(i) else null
    case FromEnd(i) =>
      if (node.isArray && i >= 1 && node.size - i >= 0) node.get(node.size - i) else null
  }

  /** null = missing / JSON-null (SQL NULL for both accessor forms) */
  def extract(json: String, segs: Seq[Seg], unquote: Boolean): UTF8String = {
    var node = parse(json)
    val it = segs.iterator
    while (node != null && it.hasNext) node = step(node, it.next())
    if (node == null || node.isNull) null
    else if (unquote && node.isTextual) UTF8String.fromString(node.asText)
    else UTF8String.fromString(mapper.writeValueAsString(node))
  }

  def arrayLength(json: String, segs: Seq[Seg]): Any = {
    var node = parse(json)
    val it = segs.iterator
    while (node != null && it.hasNext) node = step(node, it.next())
    if (node == null || node.isNull) null
    else if (node.isArray) node.size
    else 0
  }

  // via parse() so the MissingNode guard applies: DuckDB 1.0's
  // json_valid('') / whitespace-only is false (r14 ADVICE)
  def valid(json: String): Boolean =
    try { parse(json); true } catch { case _: Exception => false }
}

case class DuckJsonExtract(left: Expression, right: Expression, unquote: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def prettyName: String =
    if (unquote) "json_extract_string" else "json_extract"
  override def nullable: Boolean = true // a missing path is SQL NULL
  // the path is a literal in every dialect spelling — cache its parse
  @transient private lazy val litSegs: Option[Seq[DuckJsonPath.Seg]] =
    if (right.foldable) Option(right.eval(null))
      .map(p => DuckJsonPath.segments(p.toString))
    else None
  override def nullSafeEval(j: Any, p: Any): Any = {
    val segs = litSegs.getOrElse(DuckJsonPath.segments(p.toString))
    DuckJsonPath.extract(j.toString, segs, unquote)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckJsonExtract =
    copy(left = l, right = r)
}

case class DuckJsonArrayLength(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def prettyName: String = "json_array_length"
  override def nullable: Boolean = true // a missing path is SQL NULL
  @transient private lazy val litSegs: Option[Seq[DuckJsonPath.Seg]] =
    if (right.foldable) Option(right.eval(null))
      .map(p => DuckJsonPath.segments(p.toString))
    else None
  override def nullSafeEval(j: Any, p: Any): Any = {
    val segs = litSegs.getOrElse(DuckJsonPath.segments(p.toString))
    DuckJsonPath.arrayLength(j.toString, segs)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckJsonArrayLength =
    copy(left = l, right = r)
}

case class DuckJsonValid(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "json_valid"
  override def nullSafeEval(j: Any): Any = DuckJsonPath.valid(j.toString)
  override protected def withNewChildInternal(c: Expression): DuckJsonValid =
    copy(child = c)
}
