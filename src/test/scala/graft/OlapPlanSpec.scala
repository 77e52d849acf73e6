package graft

import org.apache.spark.sql.functions._

/** Plan + equivalence locks for the OLAP headline queries (Olap.scala)
  * and the bloom decontamination gate — the properties each query's
  * 100 TB scale note claims. */
class OlapPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // scan metadata (PushedFilters/ReadSchema) truncates at 100 chars by
    // default, hiding the later pushed filters from the assertion
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("Q1 aggregates partial-then-final with the shipdate filter pushed") {
    val p = plan("q_tpch_q1")
    assert(p.contains("partial_sum"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(1200))
  }

  test("Q3 top-10 runs as TakeOrderedAndProject, never a global sort") {
    val p = plan("q_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("rangepartitioning"), p.take(800))
  }

  test("Q5 broadcasts only the supplier⋈nation⋈region dim tree") {
    val p = plan("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // lineitem and orders must arrive via shuffle, not broadcast: the
    // explicit broadcast() covers the dim side only. AQE may add its own
    // small-side broadcasts at sf0.001 runtime; the STATIC plan carries
    // exactly the hinted dim exchange plus AQE-planned customer/orders
    // candidates — the fact table l_orderkey join must stay non-broadcast.
    assert(!p.linesIterator.exists(l =>
        l.contains("BroadcastExchange") && l.contains("l_orderkey")),
      p.take(1500))
  }

  test("Q6 pushes every predicate to the parquet scan and prunes columns") {
    val p = plan("q_tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(1200))
    assert(p.contains("LessThan(l_quantity,24.0)"), p.take(1200))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"), p.take(1200))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_returnflag"), readSchema)
  }

  test("Q18 aggregates lineitem exactly once and top-100s via TakeOrdered") {
    val p = plan("q_tpch_q18")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    // one partial+final agg pair over lineitem, no re-aggregation after
    // the joins (the saved second lineitem shuffle is the point)
    assert("partial_sum".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("Q19's OR-of-ANDs derives single-table residuals into both scans") {
    // The full disjunction mixes part and lineitem columns and can only
    // run post-join — but CNF conversion must push the per-table
    // residuals (union of quantity ranges; brand/size combinations) into
    // the scans so the join inputs shrink before shuffling.
    val p = plan("q_tpch_q19")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"), p.take(2500))
    assert(p.contains("LessThanOrEqual(p_size,15)"), p.take(2500))
  }

  test("Q13 never broadcasts the orders side (fact⋈fact outer join)") {
    val p = plan("q_tpch_q13")
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftOuter"),
      p.take(1200))
    assert(!p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("Q9 broadcasts only the nation dim; facts arrive via shuffle") {
    val p = plan("q_tpch_q9")
    assert(p.contains("partial_sum"), p.take(800))
    // the only hinted broadcast is nation (25 rows at any SF); the
    // orders/lineitem fact join must not carry a static broadcast
    assert(!p.linesIterator.exists(l =>
        l.contains("BroadcastExchange") && l.contains("o_orderkey")),
      p.take(2000))
  }

  test("Q11's threshold is one 1-row broadcast over the grouped set") {
    val p = plan("q_tpch_q11")
    // the supplier gate must land as a LEFT SEMI join, the scalar
    // threshold as a broadcast nested-loop over the 1-row aggregate —
    // never a per-part re-aggregation
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert("partial_sum".r.findAllIn(p).size <= 3, p.take(2500))
  }

  test("Q12 pushes the shipdate year filter to the lineitem scan") {
    val p = plan("q_tpch_q12")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
    // the lateness comparison mixes both tables and rides the join —
    // but the single-table year range must still prune the scan
    val readSchema = p.linesIterator
      .find(l => l.contains("ReadSchema:") && l.contains("l_returnflag"))
      .getOrElse("")
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("bucketed fact⋈fact join and its groupBy run with zero exchanges") {
    val df = SparkEntry.queries("q_join_bucketed")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      p.take(1200))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("SelectedBucketsCount"), p.take(2000))
  }

  test("salted aggregation equals the direct groupBy on a skewed fixture") {
    import spark.implicits._
    // one giant key (the skew case salting exists for) + small keys
    val df = (Seq.fill(5000)(("hot", 1.0)) ++
        (1 to 50).map(i => (s"k$i", i.toDouble)))
      .toDF("k", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val salted = graft.functions.ScalePatterns
      .saltedSum(df, col("k"), col("v"), 16)
      .select(col("key"), col("sum").cast("double"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val direct = df.groupBy(col("k").as("key"))
      .agg(sum("v").cast("double").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === direct)
  }

  test("bloom gate: q_decontaminate_bloom ≡ q_decontaminate, and the " +
      "plan probes a bloom subquery before the distinct") {
    val bloomDf = SparkEntry.queries("q_decontaminate_bloom")(spark, sf)
    val exact = SparkEntry.queries("q_decontaminate")(spark, sf)
      .collect().toSeq
    assert(bloomDf.collect().toSeq === exact)
    assert(exact.nonEmpty) // fixture must actually exercise the overlap
    val p = bloomDf.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(1500))
    // the exact-verify join must NOT hint a broadcast of the gram set
    // (the premise of the bloom path); AQE deciding so at runtime on
    // tiny fixtures is fine — the static hint is what we lock.
    val analyzed = bloomDf.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("broadcast"),
      analyzed.take(1500))
  }

  // --- the round-8 TPC-H closers (Olap2.scala) ---

  private def scanCount(p: String, table: String): Int =
    p.linesIterator.count(l =>
      l.contains(s"$table.parquet") && l.contains("FileScan"))

  test("Q2's correlated MIN runs as a part-key-partitioned window, " +
      "top-100 via TakeOrdered — no cartesian, no global window") {
    val p = plan("q_tpch_q2")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    val windowLine = p.linesIterator.find(_.contains("Window"))
    assert(windowLine.exists(_.contains("l_partkey")), windowLine.toString)
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("Q4's EXISTS is a LEFT SEMI with the quarter filter pushed to " +
      "the orders scan; Q16/Q22's exclusions are LEFT ANTI") {
    val p4 = plan("q_tpch_q4")
    assert(p4.contains("LeftSemi"), p4.take(1000))
    assert(p4.contains("GreaterThanOrEqual(o_orderdate"), p4.take(1500))
    assert(plan("q_tpch_q16").contains("LeftAnti"))
    val p22 = plan("q_tpch_q22")
    assert(p22.contains("LeftAnti"), p22.take(1000))
    // the balance gate joins as the broadcast of ONE aggregate row
    assert(p22.contains("BroadcastNestedLoopJoin") ||
      p22.contains("BroadcastExchange"), p22.take(1200))
  }

  test("Q21's EXISTS + NOT EXISTS pair collapses to ONE lineitem scan " +
      "(the classic form takes three)") {
    val p = plan("q_tpch_q21")
    assert(scanCount(p, "lineitem") === 1, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("Q17/Q20 aggregate partial-then-final; Q20 pushes the p_name " +
      "contains-filter into the part scan") {
    val p17 = plan("q_tpch_q17")
    assert(p17.contains("partial_sum") || p17.contains("partial_count"),
      p17.take(1200))
    // the scalar-avg gate is decorrelated: equi-joins only
    assert(!p17.contains("CartesianProduct") &&
      !p17.contains("BroadcastNestedLoopJoin"), p17.take(1200))
    val p20 = plan("q_tpch_q20")
    assert(p20.contains("LeftSemi"), p20.take(1000))
    assert(p20.contains("StringContains(p_name,widget)"), p20.take(2000))
  }
}
