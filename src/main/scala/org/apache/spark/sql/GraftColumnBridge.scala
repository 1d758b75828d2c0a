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

  /** DataFrame from a custom LogicalPlan (`classic.Dataset.ofRows` is
    * `private[sql]`) — the seam graft's whole-operator plans
    * (`plans/AsOfJoinPlan.scala`) use to surface a Dataset API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
