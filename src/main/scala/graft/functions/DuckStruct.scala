package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, EvalMode, Expression, ImplicitCastInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB subscript semantics (measured on REAL DuckDB 1.0 — r13
  * struct/map differential barrage), one type-dispatched expression the
  * dialect's bracket rewrite targets (`x[i]`, `element_at`,
  * `map_extract`, `struct_extract` all share it):
  *
  *  - LIST subscripts are 1-based; `l[0]` and out-of-range are NULL
  *    (not errors); a negative index counts from the end (`l[-1]` is
  *    the last element) — all measured;
  *  - MAP subscripts return a LIST of the matching values — `m['k']`
  *    is `[10]`, a missing key is `[]`, a NULL value is `[NULL]`
  *    (measured; Spark's element_at returns the bare value / NULL,
  *    which conflates missing-key with NULL-value);
  *  - STRUCT subscripts take a foldable string key and resolve to the
  *    field; a missing key is a LOUD analysis error (DuckDB Binder
  *    error), never NULL.
  */
case class DuckSubscript(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  private def structKey: String = right match {
    case lit if lit.foldable =>
      Option(lit.eval(null)).map(_.toString).getOrElse(
        throw new IllegalArgumentException("NULL struct subscript"))
    case _ => throw new IllegalArgumentException(
      "a struct subscript must be a literal key")
  }

  override def inputTypes: Seq[DataType] = left.dataType match {
    case _: ArrayType => Seq(left.dataType, IntegerType)
    case MapType(kt, _, _) => Seq(left.dataType, kt)
    case StringType => Seq(StringType, IntegerType)
    case _ => Seq(left.dataType, StringType)
  }

  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case MapType(_, vt, vn) => ArrayType(vt, containsNull = vn)
    // STRING subscripts answer one character (r18 slice differential):
    // 1-based, negative from the end, [0] and out-of-range are the
    // EMPTY STRING (not NULL — measured 'hello'[0] = '' = 'hello'[7])
    case StringType => StringType
    case st: StructType => st(st.fieldIndex(structKey)).dataType
    case other => throw new IllegalArgumentException(
      s"cannot subscript a value of type ${other.sql}")
  }
  override def nullable: Boolean = true

  @transient private lazy val mapKeyOrd = left.dataType match {
    case MapType(kt, _, _) => TypeUtils.getInterpretedOrdering(kt)
    case _ => null
  }

  // eval (not nullSafeEval): a MAP subscript with a NULL map or NULL
  // key answers the EMPTY list, not NULL (measured r16 mapdepth
  // barrage: map_extract(NULL::MAP(..), 'a') = [] and m[NULL] = []);
  // LIST/STRUCT subscripts keep null-propagating semantics
  override def eval(input: InternalRow): Any = {
    val base = left.eval(input)
    val key = right.eval(input)
    left.dataType match {
      case MapType(kt, vt, _) =>
        if (base == null || key == null)
          return new GenericArrayData(Seq.empty[Any])
        val m = base.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        val out = Seq.newBuilder[Any]
        var i = 0
        while (i < m.numElements()) {
          if (!keys.isNullAt(i) && mapKeyOrd.equiv(keys.get(i, kt), key))
            out += (if (vals.isNullAt(i)) null else vals.get(i, vt))
          i += 1
        }
        new GenericArrayData(out.result())
      case _ if base == null || key == null => null
      case StringType =>
        val str = base.asInstanceOf[UTF8String]
        val n = str.numChars()
        val i0 = key.asInstanceOf[Int]
        val eff = if (i0 > 0) i0 - 1 else n + i0
        if (i0 == 0 || eff < 0 || eff >= n) UTF8String.EMPTY_UTF8
        else str.substringSQL(eff + 1, 1)
      case ArrayType(et, _) =>
        val arr = base.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val i0 = key.asInstanceOf[Int]
        val eff = if (i0 > 0) i0 - 1 else n + i0 // 1-based; negative from end
        if (i0 == 0 || eff < 0 || eff >= n) null
        else if (arr.isNullAt(eff)) null
        else arr.get(eff, et)
      case st: StructType =>
        val idx = st.fieldIndex(structKey)
        val row = base.asInstanceOf[InternalRow]
        if (row.isNullAt(idx)) null else row.get(idx, st(idx).dataType)
      case other => throw new IllegalArgumentException(
        s"cannot subscript a value of type ${other.sql}")
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckSubscript =
    copy(left = l, right = r)
}

/** DuckDB slice semantics (measured on REAL DuckDB 1.0 — r18 slice
  * differential barrage), the target of the dialect's bracket-slice
  * rewrite (`x[a:b]`, `x[a:b:s]`) and of `list_slice`/`array_slice`:
  *
  *  - 1-based with BOTH bounds inclusive; a NEGATIVE bound resolves to
  *    `len + bound + 1` (so `[:-1]` keeps everything and `[-2:]` is the
  *    last two) — the SAME formula for lists and strings (measured);
  *  - bounds clamp to the container (`[0:2]` starts at 1, `[:99]` ends
  *    at len); an inverted window is the empty list/string, not an
  *    error;
  *  - an explicit STEP takes every step-th element of the window; a
  *    NEGATIVE step walks `lo` DOWN to `hi` (measured `[3:1:-1]` =
  *    `[3, 2, 1]`, with lo clamping to len and hi to 1); step 0 is
  *    DuckDB's loud "Slice step cannot be zero", and any step on a
  *    STRING is DuckDB's loud not-implemented;
  *  - a NULL base, bound, or step answers NULL; an OPEN bound (the
  *    `[a:]` / `[:b]` syntax) defaults to the matching end — open-ness
  *    is syntactic, so the rewrite pins it with literal flags rather
  *    than conflating it with runtime NULL.
  *
  * children: (base, lo, hi, step, loOpen, hiOpen, stepGiven) — the last
  * three are literal booleans from the rewrite.
  */
case class DuckSlice(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 7,
    "__graft_slice(base, lo, hi, step, loOpen, hiOpen, stepGiven)")
  private def base = children(0)
  private def loE = children(1)
  private def hiE = children(2)
  private def stepE = children(3)
  private def flag(i: Int): Boolean =
    children(i).eval(null).asInstanceOf[Boolean]

  override def dataType: DataType = base.dataType match {
    case a: ArrayType => a
    case StringType => StringType
    case other => throw new IllegalArgumentException(
      s"cannot slice a value of type ${other.sql}")
  }
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  private def boundOf(e: Expression, input: InternalRow): Option[Long] =
    Option(e.eval(input)).map {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case d: Decimal => d.toLong
      case d: java.lang.Double => d.longValue
      case f: java.lang.Float => f.longValue
      case other => throw new IllegalArgumentException(
        s"slice bound must be numeric, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val b = base.eval(input)
    if (b == null) return null
    val isString = base.dataType == StringType
    if (flag(6) && isString)
      throw new UnsupportedOperationException(
        "Slice with steps has not been implemented for string types")
    val n: Long = base.dataType match {
      case _: ArrayType => b.asInstanceOf[ArrayData].numElements().toLong
      case _ => b.asInstanceOf[UTF8String].numChars().toLong
    }
    def resolve(e: Expression, open: Boolean, default: Long): Option[Long] =
      if (open) Some(default)
      else boundOf(e, input).map(x => if (x < 0) n + x + 1 else x)
    (resolve(loE, flag(4), 1L), resolve(hiE, flag(5), n),
      boundOf(stepE, input)) match {
      case (Some(lo0), Some(hi0), Some(step)) =>
        if (step == 0)
          throw new IllegalArgumentException("Slice step cannot be zero")
        if (isString) {
          val lo = math.max(lo0, 1L)
          val hi = math.min(hi0, n)
          val s = b.asInstanceOf[UTF8String]
          if (lo > hi) UTF8String.EMPTY_UTF8
          else s.substringSQL(lo.toInt, (hi - lo + 1).toInt)
        } else {
          val arr = b.asInstanceOf[ArrayData]
          val et = dataType.asInstanceOf[ArrayType].elementType
          val out = ArrayBuffer.empty[Any]
          if (step > 0) {
            var p = math.max(lo0, 1L)
            val hi = math.min(hi0, n)
            while (p <= hi) {
              out += (if (arr.isNullAt(p.toInt - 1)) null
                      else arr.get(p.toInt - 1, et))
              p += step
            }
          } else {
            var p = math.min(lo0, n)
            val hi = math.max(hi0, 1L)
            while (p >= hi) {
              out += (if (arr.isNullAt(p.toInt - 1)) null
                      else arr.get(p.toInt - 1, et))
              p += step
            }
          }
          new GenericArrayData(out.toArray)
        }
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSlice =
    copy(children = newChildren)
}

/** DuckDB `struct_insert(s, name := v, …)` — appends fields to a struct
  * (measured `{'a': 1, 'b': 9}` ordering: existing first, new appended).
  * The dialect rewrite flattens the `:=` pairs to
  * `__graft_struct_insert(s, 'name', v, …)`. A duplicate name is a loud
  * error, like DuckDB's Binder error.
  */
case class StructInsert(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.length % 2 == 1,
    "__graft_struct_insert(struct, 'name', value, ...)")
  private def base = children.head
  private def pairs: Seq[(String, Expression)] =
    children.tail.grouped(2).map { case Seq(n, v) =>
      require(n.foldable, "struct_insert field names must be literals")
      (n.eval(null).toString, v)
    }.toSeq

  override def dataType: DataType = {
    val st = base.dataType.asInstanceOf[StructType]
    val newFields = pairs.map { case (n, v) =>
      require(!st.fieldNames.contains(n),
        s"struct_insert: field '$n' already exists")
      StructField(n, v.dataType, nullable = true)
    }
    StructType(st.fields ++ newFields)
  }
  override def nullable: Boolean = base.nullable
  override def eval(input: InternalRow): Any = {
    val b = base.eval(input)
    if (b == null) return null
    val st = base.dataType.asInstanceOf[StructType]
    val row = b.asInstanceOf[InternalRow]
    val out = new Array[Any](st.length + pairs.length)
    var i = 0
    while (i < st.length) {
      out(i) = if (row.isNullAt(i)) null else row.get(i, st(i).dataType)
      i += 1
    }
    pairs.foreach { case (_, v) => out(i) = v.eval(input); i += 1 }
    InternalRow.fromSeq(out.toIndexedSeq)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StructInsert = copy(children = newChildren)
}

/** DuckDB `map_concat(m1, m2, …)` (r16 mapdepth barrage, measured):
  * LAST-WINS on key collision with FIRST-SEEN key order
  * (`map_concat({a=1}, {a=2})` = `{a=2}`;
  * `map_concat({a=1,b=2}, {b=9,c=3})` = `{a=1, b=9, c=3}`), NULL map
  * arguments are SKIPPED (`map_concat(m, NULL)` = `m`), and fewer than
  * two arguments is a loud error. Spark's MapConcat either errors on
  * any duplicate (default) or needs a session-wide LAST_WIN dedup
  * policy that would also silently dedup `map(…)` construction — which
  * DuckDB REFUSES — so the semantics need their own expression.
  */
case class DuckMapConcat(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length >= 2,
    "The provided amount of arguments is incorrect, map_concat needs at least two maps")

  private def mapType: MapType =
    children.map(_.dataType).collectFirst { case mt: MapType => mt }
      .getOrElse(MapType(NullType, NullType))
  override def dataType: DataType = mapType
  override def nullable: Boolean = false

  // DuckDB 1.0 errors loudly when argument key/value types differ
  // (measured: "Invalid Input Error: 'value' type of map differs between
  // arguments, expected 'MAP(VARCHAR, INTEGER)', found 'MAP(VARCHAR,
  // VARCHAR)' instead"); without this check the first map's types were
  // used to read every argument's entries — silent misread (r16 ADVICE).
  // NullType children stay legal: NULL maps are skipped at eval.
  override def checkInputDataTypes(): TypeCheckResult = {
    def render(mt: MapType): String =
      s"MAP(${mt.keyType.sql}, ${mt.valueType.sql})"
    val mts = children.map(_.dataType).collect { case mt: MapType => mt }
    val bad = children.map(_.dataType).find {
      case _: MapType | NullType => false
      case _ => true
    }
    if (bad.isDefined)
      TypeCheckResult.TypeCheckFailure(
        s"map_concat needs MAP arguments, got ${bad.get.simpleString}")
    else mts.headOption match {
      case Some(first) =>
        // catalogString ignores nullability — the "modulo nullability"
        // comparison (sameType is private[sql])
        val kDiff =
          mts.find(_.keyType.catalogString != first.keyType.catalogString)
        val vDiff =
          mts.find(_.valueType.catalogString != first.valueType.catalogString)
        if (kDiff.isDefined)
          TypeCheckResult.TypeCheckFailure(
            s"'key' type of map differs between arguments, expected " +
            s"'${render(first)}', found '${render(kDiff.get)}' instead")
        else if (vDiff.isDefined)
          TypeCheckResult.TypeCheckFailure(
            s"'value' type of map differs between arguments, expected " +
            s"'${render(first)}', found '${render(vDiff.get)}' instead")
        else TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val keyOrd =
    TypeUtils.getInterpretedOrdering(mapType.keyType)

  override def eval(input: InternalRow): Any = {
    val MapType(kt, vt, _) = mapType
    val keys = ArrayBuffer[Any]()
    val vals = ArrayBuffer[Any]()
    for (c <- children) c.eval(input) match {
      case null => // measured: NULL maps are skipped
      case m: MapData =>
        val ka = m.keyArray(); val va = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = ka.get(i, kt)
          val v = if (va.isNullAt(i)) null else va.get(i, vt)
          val at = keys.indexWhere(keyOrd.compare(_, k) == 0)
          if (at >= 0) vals(at) = v          // last wins, key keeps its slot
          else { keys += k; vals += v }
          i += 1
        }
    }
    ArrayBasedMapData(keys.toArray, vals.toArray)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckMapConcat = copy(children = newChildren)
}

/** DuckDB-style VARCHAR rendering of container values, swapped in for
  * `CAST(x AS VARCHAR)` on STRUCT/MAP/ARRAY by the post-analysis pass
  * (the element types are only known after analysis). Measured DuckDB
  * 1.0 forms (r13 struct/map differential barrage):
  *
  *  - named struct:   `{'a': 1, 'b': x}` — keys single-quoted, values
  *    bare (strings unquoted, no escaping);
  *  - unnamed `row()`: `(1, two, 3.5)` — the dialect names row() fields
  *    `__graft_unnamed_N`, which this renderer prints paren-style;
  *  - map:            `{k1=10, k2=20}`, empty map `{}`;
  *  - list:           `[1, 2, 3]` — empty strings render as nothing
  *    (`[, a]`);
  *  - NULL inside any container renders as `NULL` (uppercase); a
  *    top-level NULL stays SQL NULL.
  *
  * Atomic leaves delegate to Spark's own Cast (identical to the
  * pre-r13 behavior, keeping every atomic fixture pinned green).
  */
/** DuckDB container comparison is THREE-VALUED lexicographic (measured
  * r13 compare barrage): elements compare pairwise left-to-right; the
  * first definite inequality decides; a NULL-involved pair before any
  * decision makes the WHOLE comparison NULL; exhausting one side
  * decides by length. Spark's array/struct comparisons treat NULL
  * elements as equal values (`[NULL] = [NULL]` is true there, NULL in
  * DuckDB). Swapped in post-analysis for =, <>, <, <=, >, >= over
  * ARRAY/STRUCT operands; `IS [NOT] DISTINCT FROM` (EqualNullSafe)
  * matches Spark natively and stays put.
  */
case class DuckContainerCompare(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = s"duck_cmp_$op"

  /** three-valued compare: Some(sign) decided, None unknown */
  private def cmp(a: Any, b: Any, dt: DataType): Option[Int] = dt match {
    case ArrayType(et, _) =>
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var i = 0
      while (i < n) {
        val xn = x.isNullAt(i); val yn = y.isNullAt(i)
        if (xn || yn) return None
        cmp(x.get(i, et), y.get(i, et), et) match {
          case Some(0) =>
          case other => return other
        }
        i += 1
      }
      Some(Integer.compare(x.numElements(), y.numElements()))
    case st: StructType =>
      val x = a.asInstanceOf[InternalRow]
      val y = b.asInstanceOf[InternalRow]
      var i = 0
      while (i < st.length) {
        val xn = x.isNullAt(i); val yn = y.isNullAt(i)
        if (xn || yn) return None
        cmp(x.get(i, st(i).dataType), y.get(i, st(i).dataType), st(i).dataType) match {
          case Some(0) =>
          case other => return other
        }
        i += 1
      }
      Some(0)
    case other =>
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(other)
      Some(ord.compare(a, b))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    cmp(a, b, left.dataType) match {
      case None => null
      case Some(c) => op match {
        case "=" => c == 0
        case "<" => c < 0
        case "<=" => c <= 0
        case ">" => c > 0
        case ">=" => c >= 0
        case other => throw new IllegalStateException(s"op $other")
      }
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckContainerCompare =
    copy(left = l, right = r)
}

object DuckVarcharCast {
  private def leaf(v: Any, dt: DataType): String =
    Option(Cast(Literal.create(v, dt), StringType, Some("UTC"), EvalMode.LEGACY)
      .eval(null)).map(_.toString).getOrElse("NULL")

  /** DuckDB VARCHAR text of any value — shared with `%s`/`{}` rendering
    * in [[DuckFormat]]
    */
  def text(v: Any, dt: DataType): String = fmt(v, dt)

  /** atomic leaf via Spark's own Cast (the case class's pre-r13 path) */
  def atomicLeaf(v: Any, dt: DataType): String = leaf(v, dt)

  private def fmt(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        if (arr.isNullAt(i)) "NULL" else fmt(arr.get(i, et), et)
      }.mkString("[", ", ", "]")
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val keys = m.keyArray()
      val vals = m.valueArray()
      (0 until m.numElements()).map { i =>
        val k = fmt(keys.get(i, kt), kt)
        val vv = if (vals.isNullAt(i)) "NULL" else fmt(vals.get(i, vt), vt)
        s"$k=$vv"
      }.mkString("{", ", ", "}")
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      val unnamed = st.fields.nonEmpty &&
        st.fields.forall(_.name.startsWith("__graft_unnamed"))
      val parts = st.fields.zipWithIndex.map { case (f, i) =>
        val vv = if (row.isNullAt(i)) "NULL" else fmt(row.get(i, f.dataType), f.dataType)
        if (unnamed) vv else s"'${f.name}': $vv"
      }
      if (unnamed) parts.mkString("(", ", ", ")")
      else parts.mkString("{", ", ", "}")
    // r13 cast/hashbit barrages: DuckDB-render leaves that Spark's own
    // cast spells differently (double/float shortest-repr, blob \xHH)
    case DoubleType => DuckCastUtil.renderDouble(v.asInstanceOf[Double]).toString
    case FloatType => DuckCastUtil.renderFloat(v.asInstanceOf[Float]).toString
    case BinaryType => DuckCastUtil.renderBlob(v.asInstanceOf[Array[Byte]]).toString
    case _ => leaf(v, dt)
  }
}

case class DuckVarcharCast(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "cast"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType =>
      UTF8String.fromString(DuckVarcharCast.text(v, child.dataType))
    case dt => // atomic: exactly Spark's cast (pre-r13 pinned fixtures)
      UTF8String.fromString(DuckVarcharCast.atomicLeaf(v, dt))
  }
  override protected def withNewChildInternal(c: Expression): DuckVarcharCast =
    copy(child = c)
}
