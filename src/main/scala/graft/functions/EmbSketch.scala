package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row computation of the embedding LSH bucket keys — all
  * `nTables × nPlanes` hyperplane sign bits in ONE JVM pass per vector.
  * The interpreted shape it replaces evaluates `aggregate(zip_with(...))`
  * per PLANE (T×b = 64 interpreted element-wise folds per row for the
  * banded 8×8 config — measured 2.5 s of q_llm_dedup_embcos_banded at
  * sf0.1). Bit-identical to that chain: the dot product is the same
  * sequential left fold of `x_i.toDouble * p_i.toDouble` (p_i = ±1), and
  * a vector whose length differs from the plane dimension in EITHER
  * direction — or that carries a null element — folds to a null dot on
  * the built-in path (`zip_with` pads nulls / the product poisons),
  * which `when(dot >= 0, ...)` turns into all-'0' bits — mirrored here.
  * EmbSketchSpec property-checks key equality against the
  * functions-built twin on the real corpus plus the mismatch cases.
  */
object EmbSketch {
  /** keys "t:signbits" for each table; planes flattened [t][p][d] */
  def planeBuckets(arr: ArrayData, planes: Array[Int], nTables: Int,
      nPlanes: Int, dim: Int, isFloat: Boolean): ArrayData = {
    // ANY length mismatch (shorter OR longer than the plane dim) and any
    // null element fold to a null dot on the zip_with reference path
    // (nulls pad the shorter side / poison the product), which
    // `when(dot >= 0, …)` turns into all-'0' bits — mirrored exactly, so
    // a corrupt/variable-dim row buckets identically on both paths
    var short = arr.numElements() != dim
    if (!short) {
      var i = 0
      while (i < dim && !short) { short = arr.isNullAt(i); i += 1 }
    }
    val v = new Array[Double](if (short) 0 else dim)
    if (!short) {
      var i = 0
      while (i < dim) {
        v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
    }
    val out = new Array[Any](nTables)
    val sb = new java.lang.StringBuilder(4 + nPlanes)
    var t = 0
    var off = 0
    while (t < nTables) {
      sb.setLength(0)
      sb.append(t).append(':')
      var p = 0
      while (p < nPlanes) {
        if (short) sb.append('0')
        else {
          var acc = 0.0
          var d = 0
          val base = off
          while (d < dim) { acc += v(d) * planes(base + d); d += 1 }
          sb.append(if (acc >= 0) '1' else '0')
        }
        off += dim
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** sequential-left-fold dot product of two equal-length numeric arrays,
    * bit-identical to `aggregate(zip_with(a, b, x.double * y.double),
    * 0.0, acc + x)` (and so to the oracle's `list_sum(list_transform(...))`
    * fold): same element order, same double arithmetic. Mismatched
    * lengths or a null element yield null, exactly as zip_with's null
    * padding collapses the built-in fold.
    */
  def arrayDot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def arrayDotCol(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def planeBucketsCol(c: Column, tabs: Seq[Seq[Seq[Int]]]): Column = {
    val nTables = tabs.length
    val nPlanes = tabs.head.length
    val dim = tabs.head.head.length
    val flat = tabs.flatten.flatten
    ColumnBridge.column(
      PlaneBuckets(ColumnBridge.expression(c), flat, nTables, nPlanes, dim))
  }
}

/** see [[EmbSketch.planeBuckets]] */
case class PlaneBuckets(child: Expression, planes: Seq[Int],
    nTables: Int, nPlanes: Int, dim: Int)
    extends UnaryExpression {
  // Seq field for structural equality (see MinHashSig); array for eval
  private lazy val planesArr = planes.toArray
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    EmbSketch.planeBuckets(input.asInstanceOf[ArrayData], planesArr,
      nTables, nPlanes, dim, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planesArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EmbSketch.planeBuckets($c, $pRef, " +
        s"$nTables, $nPlanes, $dim, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): PlaneBuckets =
    copy(child = newChild)
}

/** see [[EmbSketch.arrayDot]] */
case class ArrayDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val aFloat = isFloat(left)
  private lazy val bFloat = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    EmbSketch.arrayDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""Object $tmp = graft.functions.EmbSketch.arrayDot($a, $b, $aFloat, $bFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $tmp).doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
