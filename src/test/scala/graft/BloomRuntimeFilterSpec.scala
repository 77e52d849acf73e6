package graft

import org.apache.spark.sql.DataFrame

/** Runtime Bloom-filter join pushdown on the TPC-H fact joins.
  *
  * At 100 TB the part/supplier sides of Q9/Q5/Q8 are fact-scaled and
  * shuffle on their keys; Spark's InjectRuntimeFilter then builds a Bloom
  * filter from the SELECTIVE creation side (e.g. Q9's p_name filter) and
  * pushes `might_contain` onto the big probe scan, pruning shuffle input
  * at the map side — the single biggest scale lever on these stars
  * (VERDICT r6 item 1).
  *
  * At test SF those dims fit under autoBroadcastJoinThreshold, so the
  * correct plan is a broadcast join and Spark rightly injects nothing
  * (a bloom adds no pruning a broadcast hash join doesn't already do).
  * This spec simulates fact-scale conditions — auto-broadcast off, the
  * application-side scan-size threshold (default 10 GiB, trivially met by
  * a real lineitem) dropped to 0 — and locks in that:
  *   1. the optimizer injects the bloom (bloom_filter_agg creation +
  *      might_contain probe) into Q9/Q5/Q8's executed plans, and
  *   2. results are bit-identical to the default-config run (a bloom is
  *      a pure prefilter; false positives only cost join work).
  */
class BloomRuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withFactScaleConf[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      body
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  private def run(name: String): (Seq[String], String) = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    val rows = df.collect().map(_.toString).toSeq
    (rows, df.queryExecution.executedPlan.toString)
  }

  test("bloom filter is enabled session-wide (Spark 4 default)") {
    assert(spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.enabled") === "true")
  }

  test("Q9: fact-scale plan injects a p_partkey bloom onto the lineitem " +
      "probe; results unchanged") {
    val (baseline, basePlan) = run("q_tpch_q9")
    // sanity: at test SF the honest plan broadcasts the dims, no bloom
    assert(!basePlan.contains("might_contain"), basePlan.take(800))
    val (rows, plan) = withFactScaleConf(run("q_tpch_q9"))
    assert(plan.contains("bloom_filter_agg(xxhash64(p_partkey"),
      plan.linesIterator.filter(_.contains("bloom")).mkString("\n"))
    assert(plan.contains("might_contain"), plan.take(1200))
    assert(rows === baseline)
  }

  test("Q5 and Q8: fact-scale plans carry injected runtime blooms; " +
      "results unchanged") {
    for (q <- Seq("q_tpch_q5", "q_tpch_q8")) {
      val (baseline, _) = run(q)
      val (rows, plan) = withFactScaleConf(run(q))
      assert(plan.contains("bloom_filter_agg") &&
        plan.contains("might_contain"), s"$q:\n${plan.take(1200)}")
      assert(rows === baseline, q)
    }
  }
}
