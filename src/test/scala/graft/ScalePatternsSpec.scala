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
}
