package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: with one hot key dominating the left side, the
  * adaptive planner must split the skewed partition instead of letting
  * one task process 90% of the data — the runtime re-plan the 100 TB
  * design leans on before reaching for manual salting. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    import spark.implicits._
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf
          .get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // 90% of left rows share key 0; pad column makes bytes-per-row real
      val left = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(0L))
          .otherwise(col("id") % 1000).as("k"),
          concat(lit("x"), col("id").cast("string"), lit("y" * 40))
            .as("pad"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        lit("r").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS dataset (not a derived count plan) so its adaptive
      // plan is finalized before inspection
      val n = joined.collect().length
      assert(n === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"expected AQE skew split in:\n${plan.take(1200)}")
    } finally {
      restore.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }

  test("q_join_skewed's join gets an AQE skew split at fact-scale " +
      "conditions, with results identical to the default plan") {
    val sf = "/root/testdata/sf0.01"
    // default-conf run: the dim broadcasts, no skew handling needed
    val expected = operators.Olap.qJoinSkewed(spark, sf)
      .collect().map(_.toSeq)
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val restore = keys.map(k => k -> spark.conf.get(k)).toMap
    try {
      // fact-scale simulation: both sides must shuffle and the hot
      // partition must cross the (fixture-sized) skew thresholds
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // the fact side is pre-repartitioned to 8 map tasks: AQE splits a
      // skewed reduce partition BY MAPPER RANGES, so the single-mapper
      // shuffle a one-row-group 2 MB fixture file produces is
      // unsplittable no matter how skewed — at 100 TB the fact scan is
      // thousands of mappers and this is the shape under test
      val joined = operators.Olap.skewedFactJoin(
        Tables.lineitem(spark, sf).repartition(8),
        Tables.supplier(spark, sf))
      // execute THIS dataset (not a derived count plan) so its adaptive
      // plan is finalized before inspection
      val n = joined.collect().length
      assert(n.toLong >= Tables.lineitem(spark, sf).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // precise marker only: OptimizeSkewedJoin tags the SMJ node with
      // `skew=true`. (A looser substring like "skewed" could match conf
      // or hint text rather than an actual split — ADVICE r7.)
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin split (skew=true) in:\n${plan.take(1200)}")
      // the full declared query under the skew-split regime must return
      // the identical rows (AQE skew handling is execution-layer only)
      val skewRun = operators.Olap.qJoinSkewed(spark, sf)
        .collect().map(_.toSeq)
      assert(skewRun.toSeq === expected.toSeq)
    } finally {
      restore.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }

  test("fact-by-fact hot-entity join (q_join_skewed_facts) gets an AQE " +
      "skew split — no broadcast rescue exists — with identical results") {
    val sf = "/root/testdata/sf0.01"
    val expected = operators.Olap.qJoinSkewedFacts(spark, sf)
      .collect().map(_.toSeq)
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val restore = keys.map(k => k -> spark.conf.get(k)).toMap
    try {
      // fact-scale simulation: with auto-broadcast OFF neither side can
      // broadcast (both are fact tables at 100 TB), so the join MUST be
      // a shuffle SMJ — splitting the hot-entity partition is the only
      // anti-skew lever, unlike the fact⋈dim case above
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // both fact scans pre-repartitioned to 8 map tasks: skewed reduce
      // partitions split by MAPPER ranges, so single-mapper shuffles are
      // unsplittable no matter how skewed (the fixture parquet is one
      // row group); at 100 TB each side is thousands of mappers
      val joined = operators.Olap.hotEntityJoin(
        Tables.lineitem(spark, sf).repartition(8),
        Tables.orders(spark, sf).repartition(8))
      val n = joined.collect().length
      assert(n.toLong === Tables.lineitem(spark, sf).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin split (skew=true) in:\n${plan.take(1200)}")
      // identical rows under the skew-split regime
      val skewRun = operators.Olap.qJoinSkewedFacts(spark, sf)
        .collect().map(_.toSeq)
      assert(skewRun.toSeq === expected.toSeq)
    } finally {
      restore.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
