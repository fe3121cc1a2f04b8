package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DuckSubstring3, DuckTrunc, GuardedShift}

/** r16 (VERDICT task 7): DuckTrunc, DuckSubstring3 and GuardedShift were
  * CodegenFallback in r15 — interpreted per row. They now emit real
  * generated code (a static call into NumericEdge, same shape as their
  * siblings DuckSign/DuckFmod/GuardedMath). CodegenFallback's doGenCode
  * emits an `.eval(` trampoline through ctx.references instead, so
  * asserting the static-call text proves whole-stage-friendly codegen.
  */
class NumericCodegenSpec extends AnyFunSuite {

  private def genCodeText(e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    val ctx = new CodegenContext
    e.genCode(ctx).code.toString
  }

  test("GuardedShift codegens a NumericEdge.shiftLeft/shiftRight static call") {
    val a = BoundReference(0, LongType, nullable = true)
    val left = genCodeText(GuardedShift(a, Literal(2L), isLeft = true))
    assert(left.contains("graft.functions.NumericEdge.shiftLeft"))
    assert(!left.contains(".eval("))
    val right = genCodeText(GuardedShift(a, Literal(2L), isLeft = false))
    assert(right.contains("graft.functions.NumericEdge.shiftRight"))
  }

  test("DuckTrunc codegens per input flavor") {
    val dbl = genCodeText(DuckTrunc(BoundReference(0, DoubleType, nullable = true)))
    assert(dbl.contains("graft.functions.NumericEdge.truncDouble"))
    assert(!dbl.contains(".eval("))
    val dec = genCodeText(DuckTrunc(BoundReference(0, DecimalType(12, 3), nullable = true)))
    assert(dec.contains("graft.functions.NumericEdge.truncDecimal"))
    val int = genCodeText(DuckTrunc(BoundReference(0, IntegerType, nullable = true)))
    assert(!int.contains(".eval("))
  }

  test("DuckSubstring3 codegens a NumericEdge.substr3 static call") {
    val code = genCodeText(DuckSubstring3(
      BoundReference(0, StringType, nullable = true), Literal(0), Literal(3)))
    assert(code.contains("graft.functions.NumericEdge.substr3"))
    assert(!code.contains(".eval("))
  }

  test("codegen and interpreted eval agree on the guard edges") {
    // direct-eval spot checks of the static helpers the codegen calls
    import graft.functions.NumericEdge
    assert(NumericEdge.shiftLeft(0L, 64L, 64) == 0L)
    assert(NumericEdge.shiftLeft(0L, Long.MaxValue, 8) == 0L)
    assert(NumericEdge.shiftLeft(5L, 2L, 64) == 20L)
    intercept[ArithmeticException](NumericEdge.shiftLeft(0L, -1L, 64))
    intercept[ArithmeticException](NumericEdge.shiftLeft(-1L, 0L, 64))
    intercept[ArithmeticException](NumericEdge.shiftLeft(1L, 64L, 64))
    intercept[ArithmeticException](NumericEdge.shiftLeft(1L, 15L, 16))
    assert(NumericEdge.shiftRight(-8L, 1L, 64) == -4L)
    assert(NumericEdge.shiftRight(5L, 64L, 64) == 0L)
    assert(NumericEdge.shiftRight(5L, -1L, 64) == 0L)
  }
}
