package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** DuckDB's TOTAL order over any orderable value (r19 nested-ordering
  * differential, measured on real DuckDB 1.0.0): inner NULLs are
  * LARGEST (`[1,2] < [1,NULL]`, `{'a':1} < {'a':NULL}`), lists compare
  * lexicographically with a strict prefix first, structs by field
  * POSITION, doubles value < NaN (java.lang.Double.compare's
  * convention). This is the comparator twin of the memcomparable
  * [[DuckSortKey]] — used where a comparator fits (element sorts,
  * extremes) and the byte key where Spark needs a sortable column.
  */
object DuckOrder {
  /** total-order compare; null handling here is the ELEMENT rule
    * (null largest) — callers decide top-level/aggregate null skips */
  def cmp(a: Any, b: Any, dt: DataType): Int = {
    val an = a == null
    val bn = b == null
    if (an && bn) return 0
    if (an) return 1 // NULL largest
    if (bn) return -1
    dt match {
      case ArrayType(et, _) =>
        val x = a.asInstanceOf[ArrayData]
        val y = b.asInstanceOf[ArrayData]
        val n = math.min(x.numElements(), y.numElements())
        var i = 0
        while (i < n) {
          val c = cmp(if (x.isNullAt(i)) null else x.get(i, et),
            if (y.isNullAt(i)) null else y.get(i, et), et)
          if (c != 0) return c
          i += 1
        }
        Integer.compare(x.numElements(), y.numElements())
      case st: StructType =>
        val x = a.asInstanceOf[InternalRow]
        val y = b.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.length) {
          val ft = st(i).dataType
          val c = cmp(if (x.isNullAt(i)) null else x.get(i, ft),
            if (y.isNullAt(i)) null else y.get(i, ft), ft)
          if (c != 0) return c
          i += 1
        }
        0
      case DoubleType =>
        java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
      case FloatType =>
        java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
      case other =>
        TypeUtils.getInterpretedOrdering(other).compare(a, b)
    }
  }
}

/** `list_sort` / `list_reverse_sort` over lists whose ELEMENTS are
  * nested (list-of-list, list-of-struct) — Spark's array_sort/
  * sort_array would order inner NULLs smallest where DuckDB is largest
  * (measured: `list_sort([[1],[NULL],NULL,[1,2]])` =
  * `[[1], [1, 2], [NULL], NULL]`). NULL elements keep each spelling's
  * placement (ASC default last, 'NULLS FIRST' first); swapped in
  * post-analysis only for nested element types.
  */
case class DuckNestedSort(child: Expression, asc: Boolean,
    nullsFirst: Boolean) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "duck_nested_sort"

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val (nulls, vals) = (0 until a.numElements())
      .map(i => if (a.isNullAt(i)) null else a.get(i, et))
      .partition(_ == null)
    val sorted = vals.sortWith { (x, y) =>
      val c = DuckOrder.cmp(x, y, et)
      if (asc) c < 0 else c > 0
    }
    new GenericArrayData(
      (if (nullsFirst) nulls ++ sorted else sorted ++ nulls).toArray)
  }
  override protected def withNewChildInternal(c: Expression): DuckNestedSort =
    copy(child = c)
}

/** `list_min` / `list_max` over nested element types — NULL elements
  * SKIPPED (all-NULL answers NULL, measured `list_max([NULL,[1]])` =
  * `[1]`), non-null extremes by [[DuckOrder]] (so
  * `list_max([[1,NULL],[1,2]])` = `[1, NULL]` where Spark's array_max
  * answers `[1, 2]`).
  */
case class DuckNestedExtreme(child: Expression, isMax: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (isMax) "duck_nested_max" else "duck_nested_min"

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best: Any = null
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val x = a.get(i, et)
        if (best == null ||
            (if (isMax) DuckOrder.cmp(x, best, et) > 0
             else DuckOrder.cmp(x, best, et) < 0)) best = x
      }
      i += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): DuckNestedExtreme =
    copy(child = c)
}
