package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** The unkeyed interval-overlap join: the DuckDB oracle hash-proves the
  * declared aggregate; these lock what the hash can't see — the PLAN is a
  * bucketed equi-join (never a nested loop over the inequality) and the
  * exactly-once bucket rule reproduces the brute-force pair set under
  * randomized intervals, including bucket-boundary-straddling spans. */
class IntervalJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("plan lock: no cartesian or nested-loop join anywhere in the " +
    "executed interval-join plan") {
    val df = Temporal.qJoinInterval(spark, sf)
    df.collect() // finalize AQE
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        all(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        all(q.plan)
      case n => Seq(n)
    }.flatten
    val nodes = all(df.queryExecution.executedPlan).map(_.nodeName).toSet
    assert(!nodes.exists(n => n.contains("CartesianProduct") ||
      n.contains("BroadcastNestedLoop")),
      s"inequality join fell back to a non-equi plan: $nodes")
  }

  test("exactly-once: bucketed pairs == brute-force pairs on randomized " +
    "intervals, spans both shorter and longer than the bucket width") {
    import spark.implicits._
    // deterministic pseudo-random intervals; spans 0..40 vs bucket 16,
    // so intervals cover 1..4 buckets and many straddle boundaries
    def gen(n: Int, salt: Int) = (1 to n).map { i =>
      val a = ((i * 2654435761L + salt) % 500).toInt.abs
      val len = ((i * 40503L + salt * 7) % 41).toInt.abs
      (i.toLong, a, a + len)
    }
    val l = gen(300, 1).toDF("lid", "a0", "a1")
    val r = gen(200, 99).toDF("rid", "b0", "b1")
    val got = Temporal.intervalOverlapPairs(l, "a0", "a1", r, "b0", "b1", 16)
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    val brute = l.crossJoin(r)
      .filter(col("a0") <= col("b1") && col("b0") <= col("a1"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    assert(got.length === brute.length,
      s"pair count ${got.length} != brute ${brute.length}")
    assert(got === brute)
  }
}
