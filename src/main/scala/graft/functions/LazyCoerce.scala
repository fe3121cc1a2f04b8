package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that BLOCKS constant folding. DuckDB binds an
  * untyped string literal in a CASE / COALESCE branch with a lazy cast
  * to the branch type: `CASE WHEN true THEN 1 ELSE 'x' END` returns 1
  * (the dead cast never runs) while the taken-branch 'x' is a runtime
  * conversion error (both measured, r14 coercion barrage). A plain
  * foldable Cast('x' AS INT) would be evaluated by ConstantFolding
  * BEFORE SimplifyConditionals prunes the dead branch — erroring where
  * DuckDB succeeds. foldable=false defers evaluation until after
  * branch pruning, matching DuckDB on both sides.
  */
case class LazyCoerce(child: Expression) extends UnaryExpression {
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lazy_coerce"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): LazyCoerce =
    copy(child = c)
}
