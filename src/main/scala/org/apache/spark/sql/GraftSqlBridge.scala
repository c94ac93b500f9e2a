package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters
  * (Spark 4's Column is ColumnNode-based; classic-mode conversion lives in
  * org.apache.spark.sql.classic.ExpressionUtils). Lets graft's native
  * Catalyst expressions (e.g. graft.functions.RollingHash) surface as
  * ordinary `Column`s.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for planting custom logical
    * nodes like graft.plans.AsOfJoinPlan).
    */
  def analyzedPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame from a logical plan (classic-mode Dataset.ofRows). */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
