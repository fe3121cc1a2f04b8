package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** DuckDB list shape/set/vector-math natives (r16 listmath differential
  * barrage — every behavior below measured on REAL DuckDB 1.0.0; the
  * reference exposes this surface by routing SQL to DuckDB unmodified,
  * ducklakexl.py:394):
  *
  *  - `list_zip(l1, …)` pads to the LONGEST input with NULLs, treats a
  *    NULL list argument as empty (`list_zip(NULL)` is `[]`,
  *    `list_zip([1], NULL)` is `[(1, NULL)]`), and yields UNNAMED
  *    tuples — carried as `__graft_unnamed_N` struct fields so the
  *    VARCHAR renderer prints DuckDB's paren form `(1, a)`.
  *  - `list_select(l, idx)` is 1-based; index 0 / out-of-range yield a
  *    NULL element; a NULL index ELEMENT is a loud error; a NULL index
  *    LIST answers NULL.
  *  - `list_where(l, mask)` walks the MASK: true → element (NULL when
  *    the mask is longer than the list — measured
  *    `list_where([10],[true,false,true])` = `[10, NULL]`), false →
  *    dropped; NULL mask element errors; NULL mask list answers NULL.
  *  - `list_resize(l, n[, fill])`: NULL n is `[]` (NOT NULL); negative
  *    n errors; NULL l is NULL.
  *  - `list_grade_up(l)`: 1-based indices of the stable ascending
  *    sort, NULLS LAST (measured `[NULL,3,1]` → `[3, 2, 1]`).
  *  - `list_intersect(a, b)`: distinct non-NULL elements of `a` that
  *    appear in `b`, in REVERSE first-seen-in-`a` order (measured
  *    `[5,1,5,2] ∩ [1,2,5]` = `[2, 1, 5]`); NULL `a` is NULL but NULL
  *    `b` is `[]` (measured asymmetry).
  *  - `list_has_any` / `list_has_all` IGNORE NULL elements (never
  *    answer NULL for non-NULL lists — Spark's arrays_overlap answers
  *    NULL there); a NULL list argument answers NULL.
  *  - `flatten(l)` SKIPS NULL sublists (Spark's flatten answers NULL).
  *  - `list_dot_product` / `list_cosine_similarity` / `list_distance`:
  *    dimension mismatch and NULL elements are loud errors; a zero
  *    vector's cosine is -1.0 (measured, not NaN); NULL list → NULL.
  */
object ListShape {
  /** first-seen distinct of the non-null elements of `a` that appear in
    * `b`, reversed — DuckDB 1.0's measured list_intersect order */
  def intersectReversed(a: ArrayData, b: ArrayData, et: DataType,
                        equiv: (Any, Any) => Boolean): GenericArrayData = {
    val bs = ArrayBuffer[Any]()
    var i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) bs += b.get(i, et)
      i += 1
    }
    val out = ArrayBuffer[Any]()
    i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val v = a.get(i, et)
        if (bs.exists(equiv(_, v)) && !out.exists(equiv(_, v))) out += v
      }
      i += 1
    }
    new GenericArrayData(out.reverse.toArray)
  }
}

/** list_zip(l1, l2, …) — see ListShape Scaladoc. */
case class DuckListZip(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.nonEmpty, "Provide at least one argument to list_zip")

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_zip expects lists, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(
    children.zipWithIndex.map { case (c, i) =>
      StructField(s"__graft_unnamed_${i + 1}", elemType(c), nullable = true)
    }), containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arrays = children.map { c =>
      c.eval(input) match {
        case null => null
        case a: ArrayData => a
      }
    }
    val ets = children.map(elemType)
    val n = arrays.map(a => if (a == null) 0 else a.numElements())
      .foldLeft(0)(math.max)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = new GenericInternalRow(arrays.length)
      var k = 0
      while (k < arrays.length) {
        val a = arrays(k)
        if (a == null || i >= a.numElements() || a.isNullAt(i)) row.update(k, null)
        else row.update(k, a.get(i, ets(k)))
        k += 1
      }
      rows(i) = row
      i += 1
    }
    new GenericArrayData(rows)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckListZip = copy(children = newChildren)
}

/** list_select(l, idx) — 1-based gather; see ListShape Scaladoc. */
case class DuckListSelect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_select expects a list, got ${other.sql}")
  }
  private def idxType: DataType = right.dataType match {
    case ArrayType(it, _) => it
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_select expects an index list, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, idx: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val sel = idx.asInstanceOf[ArrayData]
    val it = idxType
    val et = elemType
    val out = new Array[Any](sel.numElements())
    var i = 0
    while (i < sel.numElements()) {
      if (sel.isNullAt(i)) throw new IllegalArgumentException(
        "NULLs are not allowed as list elements in the second input parameter")
      val pos = sel.get(i, it).asInstanceOf[Number].longValue
      out(i) =
        if (pos < 1 || pos > arr.numElements()) null
        else if (arr.isNullAt(pos.toInt - 1)) null
        else arr.get(pos.toInt - 1, et)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckListSelect =
    copy(left = l, right = r)
}

/** list_where(l, mask) — mask-driven filter; see ListShape Scaladoc. */
case class DuckListWhere(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_where expects a list, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, m: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val mask = m.asInstanceOf[ArrayData]
    val et = elemType
    val out = ArrayBuffer[Any]()
    var i = 0
    while (i < mask.numElements()) {
      if (mask.isNullAt(i)) throw new IllegalArgumentException(
        "NULLs are not allowed as list elements in the second input parameter")
      if (mask.getBoolean(i))
        out += (if (i >= arr.numElements() || arr.isNullAt(i)) null
                else arr.get(i, et))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckListWhere =
    copy(left = l, right = r)
}

/** list_resize(l, n[, fill]) — see ListShape Scaladoc. */
case class DuckListResize(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 2 || children.length == 3,
    "list_resize(l, n[, fill])")
  private def l = children(0)
  private def elemType: DataType = l.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_resize expects a list, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val lv = l.eval(input)
    if (lv == null) return null
    val arr = lv.asInstanceOf[ArrayData]
    val nv = children(1).eval(input)
    // measured: list_resize(l, NULL) is [] — NULL size, not NULL result
    if (nv == null) return new GenericArrayData(Array.empty[Any])
    val n = nv.asInstanceOf[Number].longValue
    if (n < 0) throw new IllegalArgumentException(
      s"list_resize: size value $n can't be negative")
    val fill = if (children.length == 3) children(2).eval(input) else null
    val et = elemType
    val out = new Array[Any](n.toInt)
    var i = 0
    while (i < n) {
      out(i) =
        if (i < arr.numElements()) { if (arr.isNullAt(i)) null else arr.get(i, et) }
        else fill
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckListResize = copy(children = newChildren)
}

/** list_grade_up(l) — 1-based stable ascending sort indices, NULLS
  * LAST; see ListShape Scaladoc. */
case class DuckListGradeUp(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_grade_up expects a list, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ord =
    if (elemType == NullType) null
    else TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(l: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val et = elemType
    val n = arr.numElements()
    val idx = (0 until n).sortBy(identity)(Ordering.fromLessThan[Int] { (i, j) =>
      val ni = arr.isNullAt(i); val nj = arr.isNullAt(j)
      if (ni && nj) i < j                    // stable among NULLs
      else if (ni) false                     // NULLS LAST
      else if (nj) true
      else {
        val c = ord.compare(arr.get(i, et), arr.get(j, et))
        if (c != 0) c < 0 else i < j         // stable among ties
      }
    })
    new GenericArrayData(idx.map(i => (i + 1): Any).toArray)
  }
  override protected def withNewChildInternal(c: Expression): DuckListGradeUp =
    copy(child = c)
}

/** list_intersect(a, b) — reverse first-seen distinct; see ListShape. */
case class DuckListIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case NullType => right.dataType match {
      case ArrayType(et, _) => et
      case _ => NullType
    }
    case other => throw new IllegalArgumentException(
      s"list_intersect expects lists, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ord =
    if (elemType == NullType) null
    else TypeUtils.getInterpretedOrdering(elemType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null                 // measured: NULL a -> NULL
    val b = right.eval(input)
    if (b == null)                              // measured: NULL b -> []
      return new GenericArrayData(Array.empty[Any])
    ListShape.intersectReversed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], elemType,
      (x, y) => ord.compare(x, y) == 0)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckListIntersect =
    copy(left = l, right = r)
}

/** list_has_any / list_has_all — NULL elements ignored; see ListShape. */
case class DuckListHas(left: Expression, right: Expression, all: Boolean)
    extends BinaryExpression with CodegenFallback {
  private def sideType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"list_has_${if (all) "all" else "any"} expects lists, got ${other.sql}")
  }
  private def elemType: DataType = {
    val lt = sideType(left)
    if (lt != NullType) lt else sideType(right)
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val ord =
    if (elemType == NullType) null
    else TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val et = elemType
    def contains(hay: ArrayData, v: Any): Boolean = {
      var i = 0
      while (i < hay.numElements()) {
        if (!hay.isNullAt(i) && ord.compare(hay.get(i, et), v) == 0) return true
        i += 1
      }
      false
    }
    if (all) {
      var i = 0
      while (i < b.numElements()) {
        if (!b.isNullAt(i) && !contains(a, b.get(i, et))) return false
        i += 1
      }
      true
    } else {
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i) && contains(b, a.get(i, et))) return true
        i += 1
      }
      false
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckListHas =
    copy(left = l, right = r)
}

/** flatten(l) — skips NULL sublists; see ListShape Scaladoc. */
case class DuckFlatten(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemType: DataType = child.dataType match {
    case ArrayType(ArrayType(et, _), _) => et
    case ArrayType(NullType, _) => NullType   // flatten([NULL]) -> []
    case NullType => NullType
    case other => throw new IllegalArgumentException(
      s"flatten expects a list of lists, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any): Any = {
    val outer = l.asInstanceOf[ArrayData]
    val et = elemType
    val out = ArrayBuffer[Any]()
    var i = 0
    while (i < outer.numElements()) {
      if (!outer.isNullAt(i)) {
        val inner = outer.get(i, ArrayType(et)).asInstanceOf[ArrayData]
        var j = 0
        while (j < inner.numElements()) {
          out += (if (inner.isNullAt(j)) null else inner.get(j, et))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): DuckFlatten =
    copy(child = c)
}

/** list_dot_product / list_cosine_similarity / list_distance over
  * ARRAY<DOUBLE> — codegen'd single loop (this sits on the embedding
  * hot path); see ListShape Scaladoc for the measured edges. */
case class DuckVecMath(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(Set("dot", "cos", "dist").contains(op), s"bad vec op $op")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def fnName: String = op match {
    case "dot" => "list_inner_product"
    case "cos" => "list_cosine_similarity"
    case "dist" => "list_distance"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    DuckVecMath.compute(a, b, op, fnName)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""${ev.value} = graft.functions.DuckVecMath.compute($a, $b, "$op", "$fnName");"""
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckVecMath =
    copy(left = l, right = r)
}

object DuckVecMath {
  /** measured DuckDB 1.0: dimension mismatch + NULL elements error
    * loudly; cosine of a zero vector is -1.0 */
  def compute(a: ArrayData, b: ArrayData, op: String, fn: String): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"$fn: list dimensions must be equal, got left length $n and right length ${b.numElements()}")
    if (n == 0) throw new IllegalArgumentException(
      s"$fn: empty list operands are not supported")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var dist = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: left argument can not contain NULL values")
      if (b.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: right argument can not contain NULL values")
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      val d = x - y; dist += d * d
      i += 1
    }
    op match {
      case "dot" => dot
      case "dist" => math.sqrt(dist)
      case "cos" =>
        if (na == 0.0 || nb == 0.0) -1.0      // measured zero-vector form
        else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }
}
