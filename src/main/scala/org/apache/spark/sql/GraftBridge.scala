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

  /** Re-root a batch DataFrame as a streaming one (`isStreaming=true`)
    * so a V1 `Source.getBatch` can return an arbitrary Catalyst plan
    * (parquet scans, joins) and still splice into the micro-batch
    * execution, which asserts the returned frame is streaming — the
    * pattern file/lakehouse-style streaming sources use. The inner
    * plan stays lazy: planning (with pushdown/pruning) happens per
    * batch when the wrapped RDD is consumed. */
  def streamingDataFrame(s: SparkSession, df: Dataset[Row])
      : Dataset[Row] = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }
}
