package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per sbt test run). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkEntry.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Reference plans fixture — mirror of data/plans.json:1-5. */
  def plansFixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "Free", 0.0, "2025-01-01", "2025-12-31"),
      (2L, "Pro", 29.0, "2025-01-01", "2025-12-31"),
      (3L, "Team", 99.0, "2025-01-01", "2025-12-31"))
      .toDF("subscription_plan_id", "subscription_plan_name",
        "subscription_price", "subscription_plan_start_date",
        "subscription_plan_end_date")
  }

  /** Reference subscriptions fixture — data/user_subscriptions.json:1-4
    * (payment_status absent in seed rows → null). */
  def subsFixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1001L, 101L, 1L, "active", "2025-01-01", "2025-12-31",
        Option.empty[String]),
      (1002L, 102L, 2L, "active", "2025-02-01", "2025-12-31",
        Option.empty[String]))
      .toDF("subscription_id", "user_id", "subscription_plan_id",
        "subscription_status", "start_date", "end_date", "payment_status")
  }

  /** All file scans in an executed plan, descending into AQE subtrees
    * (AdaptiveSparkPlanExec and materialized query stages are leaf-like
    * nodes hiding their finalized subplans from a plain collect). */
  def collectFileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectFileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      collectFileScans(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      collectFileScans(r.child)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
  }.flatten
}
