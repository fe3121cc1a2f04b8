// Bridge for `private[sql]` helpers: wrapping a raw Catalyst Expression
// into a public Column goes through org.apache.spark.sql.classic
// .ExpressionUtils, which is sql-package-private in Spark 4 — the
// conventional extension-library pattern is a one-line forwarder living
// in the sql package.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** registering a custom Expression under a SQL-callable name goes
  * through `sessionState.functionRegistry`, which is sql-package-private
  * — same forwarder pattern as [[ColumnBridge]] */
object FunctionRegistryBridge {
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
}

/** building a DataFrame from a transformed LogicalPlan goes through
  * `Dataset.ofRows`, sql-package-private in Spark 4 — same forwarder
  * pattern as [[ColumnBridge]] (used for type-aware post-analysis
  * dialect fixes a textual rewrite cannot make, e.g. DATE - DATE)
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** parsing SQL text to an UNRESOLVED plan goes through
  * `sessionState.sqlParser`, sql-package-private in Spark 4 — same
  * forwarder pattern as [[ColumnBridge]] (used by the r14 coercion
  * repair, which must see the plan BEFORE Spark's ANSI coercion
  * resolves set-op branch types away from DuckDB's lattice)
  */
object ParserBridge {
  def parsePlan(spark: org.apache.spark.sql.SparkSession, text: String):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(text)
}

/** the bench's shuffle-bytes audit reads task-metric deltas around a
  * query; the listener queue is async, so the deltas are only exact
  * after `listenerBus.waitUntilEmpty()` — which is private[spark]
  */
object ListenerBridge {
  def waitUntilEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
