package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters, the
  * standard pattern for libraries adding custom Catalyst expressions (Spark 4
  * moved `Column` onto ColumnNode, so `new Column(expr)` no longer exists; the
  * sanctioned converters live in `classic.ExpressionUtils`, package-private to
  * `org.apache.spark.sql`). Used by `graft.functions` and by corpus-plane
  * expression-level kernels (e.g. `Classifier.intDiv`). */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-bind an analyzed plan to another session of the same SparkContext
    * (`classic.Dataset.ofRows` is package-private). Used to run a query under
    * session-isolated SQL confs without mutating the caller's session. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
