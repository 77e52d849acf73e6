package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Executed-plan file-scan collector for probes/tooling: descends into
  * AQE subtrees (AdaptiveSparkPlanExec and materialized query stages are
  * leaf-like nodes hiding their finalized subplans from a plain
  * collect). Mirrors SparkSpec.collectFileScans for non-test callers. */
object PlanScans {
  def collect(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collect(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      collect(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      collect(r.child)
    case f: FileSourceScanExec => Seq(f)
  }.flatten
}
