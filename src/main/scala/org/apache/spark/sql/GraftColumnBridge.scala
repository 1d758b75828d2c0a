package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression <-> Column bridge for graft's native Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so the one-line conversions
  * live in this package — the standard seam third-party Catalyst extensions
  * use when they construct Columns from custom Expressions without going
  * through a session's function registry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
