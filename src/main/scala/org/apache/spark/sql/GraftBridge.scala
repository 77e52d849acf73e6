package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for graft's
  * native Catalyst expressions (Spark 4.x moved the public
  * `new Column(expr)` constructor behind the classic module). This is the
  * standard extension-library pattern: a tiny shim compiled into the
  * org.apache.spark.sql package, nothing else reaches into internals.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A DataFrame over an already-analyzed logical plan (Spark 4.x moved
    * `Dataset.ofRows` behind the classic module) — used by optimizer
    * rules that plan a helper frame over a matched subtree. */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Dataset[Row] =
    classic.Dataset.ofRows(
      s.asInstanceOf[classic.SparkSession], plan)
}
