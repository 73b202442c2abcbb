package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters, the
  * standard pattern for libraries adding custom Catalyst expressions (Spark 4
  * moved `Column` onto ColumnNode, so `new Column(expr)` no longer exists; the
  * sanctioned converters live in `classic.ExpressionUtils`, package-private to
  * `org.apache.spark.sql`). Only used by `graft.functions`. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
