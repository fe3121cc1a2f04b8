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
  private[functions] val mapper = new ObjectMapper()

  /** DuckDB(yyjson)-compatible JSON double text (r16 probe: 4,000 random
    * doubles incl. subnormals and boundary exponents, 0 drift vs DuckDB
    * 1.0.0): SHORTEST round-trip digits; plain decimal when the decimal
    * exponent is in [-6, 20], integral values keeping a trailing '.0';
    * otherwise `d[.ddd]e<exp>` (lowercase e, no '+', unpadded); bare
    * NaN / Infinity / -Infinity; '-0.0' keeps its sign. Java 17's
    * Double.toString is NOT shortest-repr (it emits a 17th digit where
    * 16 round-trip — 37/1500 of the probe), so digits come from a trial
    * round through BigDecimal instead.
    */
  def renderJsonDouble(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == Double.PositiveInfinity) return "Infinity"
    if (d == Double.NegativeInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val ad = math.abs(d)
    val exact = new java.math.BigDecimal(ad)
    var best: java.math.BigDecimal = null
    var k = 1
    while (best == null && k <= 17) {
      val r = exact.round(new java.math.MathContext(k, java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == ad) best = r
      k += 1
    }
    val stripped = best.stripTrailingZeros
    val digs = stripped.unscaledValue.toString
    val decExp = digs.length - 1 - stripped.scale
    val pointPos = decExp + 1
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (decExp >= 21 || decExp < -6) {
      sb.append(digs.charAt(0))
      if (digs.length > 1) sb.append('.').append(digs.substring(1))
      sb.append('e').append(decExp)
    } else if (pointPos >= digs.length) {
      sb.append(digs)
      var i = digs.length
      while (i < pointPos) { sb.append('0'); i += 1 }
      sb.append(".0")
    } else if (pointPos > 0) {
      sb.append(digs.substring(0, pointPos)).append('.').append(digs.substring(pointPos))
    } else {
      sb.append("0.")
      var i = 0
      while (i < -pointPos) { sb.append('0'); i += 1 }
      sb.append(digs)
    }
    sb.toString
  }

  /** TIMESTAMP wall text `yyyy-MM-dd HH:mm:ss[.ffffff]`, fraction trimmed
    * (measured: to_json(TIMESTAMP '… .120') renders '.12') */
  private def wallText(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (frac == 0) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** TIME text `HH:mm:ss[.ffffff]` from Spark's nanos-of-day */
  private def timeText(nanos: Long): String = {
    val secOfDay = nanos / 1000000000L
    val micros = (nanos % 1000000000L) / 1000L
    val base = f"${secOfDay / 3600}%02d:${secOfDay / 60 % 60}%02d:${secOfDay % 60}%02d"
    if (micros == 0) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }

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
        renderJsonDouble(v.asInstanceOf[Number].doubleValue())
      case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
      case DateType =>
        "\"" + java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()) + "\""
      case TimestampType | TimestampNTZType =>
        "\"" + wallText(v.asInstanceOf[Number].longValue()) + "\""
      case _: TimeType =>
        "\"" + timeText(v.asInstanceOf[Number].longValue()) + "\""
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
    val sb = new StringBuilder("{")
    var i = 0
    children.grouped(2).zip(valueRenderers.iterator).foreach { case (Seq(k, _), vr) =>
      val kv = k.eval(input)
      // measured: json_object(NULL, 1) = '{}' — a NULL-key pair is skipped
      if (kv != null) {
        val v = vr.eval(input)
        if (i > 0) sb.append(',')
        sb.append(DuckJsonBuild.mapper.writeValueAsString(kv.toString))
          .append(':').append(if (v == null) "null" else v.toString)
        i += 1
      }
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
