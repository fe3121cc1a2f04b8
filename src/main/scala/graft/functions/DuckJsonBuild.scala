package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB JSON construction/inspection twins (r15 json-build probe —
  * every rule MEASURED on DuckDB 1.0.0):
  *
  *  - to_json / json_quote accept ANY value: scalars render as JSON
  *    (strings/dates quoted+escaped, numerics/bools bare), struct/
  *    array/map inputs delegate to Catalyst's StructsToJson (whose
  *    compact render already matches). Spark's to_json REFUSES scalars.
  *  - json_object(k, v, …) / json_array(v, …) build documents from
  *    mixed-typed arguments ('[1,"a",null]') — inexpressible with
  *    Spark's named_struct/array coercion.
  *  - json_merge_patch is RFC 7386 on JSON TEXT: null patch fields
  *    delete, non-object patches replace, a SQL NULL target acts as
  *    'null' while a SQL NULL patch nulls the result.
  *  - json_type returns the DuckDB logical-type name — incl. UBIGINT
  *    for non-negative integers, BIGINT for negative.
  * CodegenFallback throughout: document construction, not corpus-pass
  * primitives.
  */
object DuckJsonBuild {
  private val mapper = new ObjectMapper()

  /** render one Spark value as compact JSON text per the measured rules */
  def renderValue(v: Any, dt: DataType): String = v match {
    case null => "null"
    case _ => dt match {
      case StringType =>
        mapper.writeValueAsString(v.asInstanceOf[UTF8String].toString)
      case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
      case ByteType | ShortType | IntegerType | LongType =>
        v.asInstanceOf[Number].longValue().toString
      case FloatType | DoubleType =>
        val d = v.asInstanceOf[Number].doubleValue()
        mapper.writeValueAsString(java.lang.Double.valueOf(d))
      case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
      case DateType =>
        "\"" + java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()) + "\""
      case other => throw new IllegalArgumentException(
        s"cannot JSON-render a ${other.simpleString} value (json build natives)")
    }
  }

  def mergePatch(target: String, patch: String): String = {
    val t = if (target == null) mapper.nullNode()
            else mapper.readTree(target)
    val p = mapper.readTree(patch)
    mapper.writeValueAsString(merge(t, p))
  }

  private def merge(t: com.fasterxml.jackson.databind.JsonNode,
      p: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = {
    if (!p.isObject) return p
    val out: ObjectNode =
      if (t != null && t.isObject) t.deepCopy[ObjectNode]()
      else JsonNodeFactory.instance.objectNode()
    val it = p.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) out.remove(e.getKey)
      else out.set(e.getKey, merge(out.get(e.getKey), e.getValue))
    }
    out
  }

  def typeName(json: String): String = {
    val n = mapper.readTree(json)
    if (n.isObject) "OBJECT"
    else if (n.isArray) "ARRAY"
    else if (n.isTextual) "VARCHAR"
    else if (n.isBoolean) "BOOLEAN"
    else if (n.isNull) "NULL"
    else if (n.isIntegralNumber) {
      // measured: non-negative integers read back as UBIGINT there
      if (n.asText().startsWith("-")) "BIGINT" else "UBIGINT"
    }
    else "DOUBLE"
  }
}

/** `to_json(x)` / `json_quote(x)` over ANY input — see [[DuckJsonBuild]] */
case class DuckToJson(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // struct/array/map inputs: Catalyst's own JSON writer (render
  // matches). StructsToJson is RuntimeReplaceable in Spark 4 — its own
  // eval asserts — so the REPLACEMENT expression evaluates here.
  private lazy val structsToJson = child.dataType match {
    case _: StructType | _: ArrayType | _: MapType =>
      Some(org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map.empty[String, String], child, Some("UTC")).replacement)
    case _ => None
  }
  override def eval(input: InternalRow): Any = structsToJson match {
    case Some(stj) => stj.eval(input)
    case None =>
      val v = child.eval(input)
      if (v == null) null
      else UTF8String.fromString(DuckJsonBuild.renderValue(v, child.dataType))
  }
  override protected def withNewChildInternal(newChild: Expression): DuckToJson =
    copy(child = newChild)
}

/** `json_array(v, …)` — mixed-typed elements render individually */
case class DuckJsonArray(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  private lazy val renderers = children.map(c => DuckToJson(c))
  override def eval(input: InternalRow): Any = {
    val parts = renderers.map { r =>
      val v = r.eval(input)
      if (v == null) "null" else v.toString
    }
    UTF8String.fromString(parts.mkString("[", ",", "]"))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckJsonArray =
    copy(children = newChildren)
}

/** `json_object(k, v, …)` — string keys, mixed-typed values */
case class DuckJsonObject(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  require(children.length % 2 == 0,
    "json_object takes key/value pairs (even argument count)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  private lazy val valueRenderers =
    children.grouped(2).map { case Seq(_, v) => DuckToJson(v) }.toSeq
  override def eval(input: InternalRow): Any = {
    val mapper = new ObjectMapper()
    val sb = new StringBuilder("{")
    var i = 0
    children.grouped(2).zip(valueRenderers.iterator).foreach { case (Seq(k, _), vr) =>
      val kv = k.eval(input)
      require(kv != null, "json_object key cannot be NULL")
      val v = vr.eval(input)
      if (i > 0) sb.append(',')
      sb.append(mapper.writeValueAsString(kv.toString))
        .append(':').append(if (v == null) "null" else v.toString)
      i += 1
    }
    UTF8String.fromString(sb.append('}').toString)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckJsonObject =
    copy(children = newChildren)
}

/** `json_merge_patch(a, b)` — RFC 7386; see [[DuckJsonBuild]] */
case class DuckJsonMergePatch(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val b = right.eval(input)
    if (b == null) return null // SQL NULL patch nulls the result (measured)
    val a = left.eval(input)
    UTF8String.fromString(DuckJsonBuild.mergePatch(
      if (a == null) null else a.toString, b.toString))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckJsonMergePatch =
    copy(left = l, right = r)
}

/** `json_type(j)` — DuckDB logical-type name; see [[DuckJsonBuild]] */
case class DuckJsonTypeOf(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(DuckJsonBuild.typeName(input.toString))
  override protected def withNewChildInternal(newChild: Expression): DuckJsonTypeOf =
    copy(child = newChild)
}
