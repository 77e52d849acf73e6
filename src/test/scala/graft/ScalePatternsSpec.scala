package graft

import org.apache.spark.sql.functions._

import graft.functions.ScalePatterns

/** Scale-pattern library: salted aggregation equivalence and bucketed
  * exchange-free joins. */
class ScalePatternsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("salted sum equals direct groupBy sum (decimal, order-independent)") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum"),
        count(lit(1)).as("cnt"))
      .orderBy("key").collect()
    val salted = ScalePatterns.saltedSum(li, col("l_returnflag"),
      col("l_quantity").cast("decimal(18,2)"), buckets = 16)
      .orderBy("key").collect()
    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (s, dd) =>
      assert(s.getAs[String]("key") === dd.getAs[String]("key"))
      assert(s.getAs[java.math.BigDecimal]("sum") ===
        dd.getAs[java.math.BigDecimal]("sum"))
      assert(s.getAs[Long]("cnt") === dd.getAs[Long]("cnt"))
    }
  }

  test("bucketed tables join without an exchange on either side") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScalePatterns.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    ScalePatterns.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    val joined = spark.table("b_orders")
      .hint("merge")
      .join(spark.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it computes the right thing
    val expect = orders.join(lineitem, "o_orderkey").count()
    assert(joined.count() === expect)
  }

  test("compaction reduces a 64-file layout to the target without a " +
      "shuffle and preserves every row") {
    val src = java.nio.file.Files.createTempDirectory("graft_compact_src")
      .toString
    val dst = java.nio.file.Files.createTempDirectory("graft_compact_dst")
      .toString
    val ev = Tables.events(spark, sf)
    ev.repartition(64).write.mode("overwrite").parquet(src)
    def partFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(partFiles(src) === 64)
    val frame = spark.read.parquet(src)
    // coalesce must NOT introduce an exchange — compaction is IO-bound
    val plan = frame.coalesce(4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    ScalePatterns.compactTo(frame, dst, targetFiles = 4)
    assert(partFiles(dst) <= 4)
    assert(spark.read.parquet(dst).count() === ev.count())
    // content identical, not just the count
    assert(spark.read.parquet(dst).select("event_id").orderBy("event_id")
      .collect().toSeq ===
      ev.select("event_id").orderBy("event_id").collect().toSeq)
  }

  test("upsertByKey over a shared bucket layout runs with zero exchanges") {
    // The 100 TB MERGE story: when base and update batch share the bucket
    // layout, the full-outer key join reads co-located buckets — no side
    // shuffles. (The declared q_upsert_bykey exercises the other regime:
    // un-bucketed updates exchange INTO the base's layout.)
    val orders = Tables.orders(spark, sf)
    ScalePatterns.writeBucketed(orders, "b_up_base", "o_orderkey", 8)
    ScalePatterns.writeBucketed(
      orders.filter(col("o_orderstatus") === "P")
        .withColumn("o_orderpriority", lit("0-REPRICED")),
      "b_up_updates", "o_orderkey", 8)
    val merged = ScalePatterns.upsertByKey(
      spark.table("b_up_base").hint("merge"),
      spark.table("b_up_updates"), "o_orderkey")
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      plan.take(1200))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed upsert must not shuffle:\n${plan.take(2000)}")
    // and the merge semantics hold: same row count (all updates matched),
    // every P row repriced
    assert(merged.count() === orders.count())
    assert(merged.filter(col("o_orderstatus") === "P" &&
      col("o_orderpriority") =!= "0-REPRICED").count() === 0L)
  }
}
