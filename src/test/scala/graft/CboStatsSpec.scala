package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer statistics locks: ANALYZE TABLE feeds exact
  * row counts and column statistics into planning. At 100 TB the stats
  * pipeline is what keeps join ordering and broadcast decisions honest —
  * file-size-only estimation over-estimates filtered branches by orders
  * of magnitude (a filtered fact side that would safely broadcast gets
  * shuffled, or worse, a "small" unfiltered side gets broadcast from a
  * stale size). These tests prove the engine's tables carry stats and
  * that CBO actually narrows estimates with them.
  */
class CboStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val tbl = "graft_stats_orders"

  private def ensureTable(): Unit =
    if (!spark.catalog.tableExists(tbl)) {
      // the managed-table location can survive a previous JVM whose
      // in-memory catalog entry did not — clear it or CREATE refuses
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
      Tables.orders(spark, sf).write.mode("overwrite").saveAsTable(tbl)
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  test("ANALYZE TABLE records the exact row count in catalog stats") {
    ensureTable()
    val expected = Tables.orders(spark, sf).count()
    // rowCount surfaces through plan stats only under the CBO visitor;
    // the basic visitor propagates sizeInBytes alone
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(tbl).queryExecution.optimizedPlan.stats
      assert(stats.rowCount === Some(BigInt(expected)), stats.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("with CBO on, column stats narrow a filter's row estimate; " +
      "without them the basic visitor keeps the full size") {
    ensureTable()
    val total = Tables.orders(spark, sf).count()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table(tbl).filter(col("o_orderstatus") === "P")
        .queryExecution.optimizedPlan.stats
      // o_orderstatus has 3 distinct values: the NDV-based estimate must
      // be well under the full count (and nonzero)
      assert(est.rowCount.exists(rc => rc > 0 && rc < BigInt(total) / 2),
        est.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // basic (size-only) estimation carries no row-count narrowing for
    // the filter: rowCount is absent entirely (fresh DF — queryExecution
    // is cached per Dataset, so the CBO-evaluated one can't be reused)
    val basic = spark.table(tbl).filter(col("o_orderstatus") === "P")
      .queryExecution.optimizedPlan.stats
    assert(basic.rowCount.isEmpty, basic.toString)
  }

  test("stats-driven broadcast: the filtered stats side broadcasts under " +
      "a threshold sized between its CBO estimate and the raw table size") {
    ensureTable()
    val rawSize = spark.table(tbl).queryExecution.optimizedPlan.stats
      .sizeInBytes
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // threshold below the full table size: only the narrowed filtered
    // estimate clears it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (rawSize / 2).toString)
    try {
      val joined = Tables.customer(spark, sf)
        .join(spark.table(tbl).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p.take(1500))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
