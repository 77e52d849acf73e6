package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.ScalePatterns

/** Classic OLAP headline queries (TPC-H shapes Q1/Q3/Q5/Q6, adapted to the
  * driver's TPC-H-ish testdata schemas) plus the salted-aggregation scale
  * pattern as a declared, oracled query.
  *
  * These are the workloads an analytics engine is judged on: wide
  * scan+agg (Q1), star-join top-k (Q3), multi-dim star join (Q5),
  * filter-heavy single-pass agg (Q6). The scale notes per query say what
  * the plan must look like at 100 TB; OlapPlanSpec locks the load-bearing
  * properties (pushed filters, partial aggregation, broadcast ONLY on
  * true dims, TakeOrdered for the top-k).
  *
  * Money determinism (QueryDef contract): every price expression runs in
  * exact DECIMAL wide enough to never round — (12,2) for prices/
  * quantities, (4,2) for the ±1-bounded rates, products at scale 4/6 —
  * and is cast to DOUBLE only at the end, so Spark and DuckDB hash
  * identically regardless of partitioning or aggregation order.
  */
object Olap {

  private def d12(c: Column): Column = c.cast("decimal(12,2)")
  private def d4(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  // shared SQL fragments for the oracle side (DuckDB applies its own
  // width rules — (12,2)*(5,2)→(17,4) etc. — exact at these widths too)
  private val sqlDisc =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private val sqlCharge =
    s"$sqlDisc * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"

  /** Q1 — pricing summary. One wide scan, partial agg map-side, 6-group
    * final: the shuffle carries ~groups×partitions rows regardless of
    * corpus size, so this is scan-bound at any scale (the point of the
    * shape). The shipdate predicate must reach the parquet scan. */
  val qTpchQ1: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    val charge = disc * (one + d4(col("l_tax")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(d12(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        sum(d4(col("l_discount"))).cast("double").as("sum_disc"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .withColumn("avg_disc", col("sum_disc") / col("count_order"))
      .drop("sum_disc")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q3 — shipping-priority top-k. customer is a FACT-SIZED table
    * (scales with SF), so it is NOT broadcast — customer⋈orders and
    * ⋈lineitem are shuffle joins on their keys (AQE may still broadcast
    * the post-filter customer side when the segment filter makes it
    * small — that's a runtime decision, not a plan assumption). The
    * top-10 runs as TakeOrderedAndProject: no global sort ever
    * materializes. */
  val qTpchQ3: (SparkSession, String) => DataFrame = (s, d) => {
    val cut = lit("1998-01-01").cast("timestamp")
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_orderpriority"))
      .agg(sum(disc).cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate_s", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Q5 — regional supplier volume. The star pattern at scale: region,
    * nation, supplier are TRUE dims (fixed/small cardinality) and are
    * broadcast explicitly; customer⋈orders and ⋈lineitem shuffle on
    * their keys. The c_nationkey = s_nationkey condition rides the
    * lineitem⋈supplier broadcast join as a post-condition filter. */
  val qTpchQ5: (SparkSession, String) => DataFrame = (s, d) => {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    val dims = Tables.supplier(s, d)
      .join(Tables.nation(s, d),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(disc).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Q6 — forecast revenue change. Pure scan+filter+agg, zero shuffle
    * beyond the single-row final agg; every predicate must be a pushed
    * parquet filter. The canary for "is the scan actually pruned". */
  val qTpchQ6: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(d12(col("l_extendedprice")) * d4(col("l_discount")))
        .cast("double").as("revenue"))

  /** Q14 — promo revenue share. Conditional aggregation over the
    * lineitem⋈part join: both conditional branches stay exact decimal
    * until the final double division (written left-associative
    * identically in both engines). part is NOT hinted broadcast — it
    * scales with SF (unlike nation/region); AQE promotes it at runtime
    * when small. */
  val qTpchQ14: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0)))
          .cast("double").as("promo"),
        sum(disc).cast("double").as("total"))
      .select(((lit(100.0) * col("promo")) / col("total"))
        .as("promo_revenue"))
  }

  /** Q18 — large-volume customers. The having-filter-then-join shape:
    * lineitem aggregates per order FIRST (partial agg map-side, one
    * shuffle on l_orderkey), the >300 filter reduces that to a tiny
    * order set, and only then do orders and customer join in. The
    * classic formulation re-joins lineitem and re-aggregates; reusing
    * the already-computed per-order sum is algebraically identical and
    * saves a second lineitem shuffle — the rewrite an optimizer would
    * want. AQE broadcasts the post-filter agg side at runtime (it is
    * ~0.1% of orders); the top-100 is TakeOrderedAndProject. */
  val qTpchQ18: (SparkSession, String) => DataFrame = (s, d) => {
    val qty = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(d12(col("l_quantity"))).as("sum_qty_d"))
      .filter(col("sum_qty_d") > 300)
    Tables.orders(s, d)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_totalprice"),
        col("sum_qty_d").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** Q19 — discounted revenue under an OR-of-ANDs predicate: the
    * disjunctive-pushdown shape. Each disjunct mixes part and lineitem
    * columns, so the whole predicate can only run post-join — but
    * Catalyst's CNF conversion must still derive the single-table
    * residuals (the union of the l_quantity ranges; the brand IN-set)
    * and push them into both scans, shrinking the join inputs. */
  val qTpchQ19: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 25) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(disc).cast("double").as("revenue"))
  }

  /** Q8 — market share: the two-nation-role star with a conditional
    * share division. Customer nations restrict to one region (the
    * market); supplier nations label the volume; share = one nation's
    * volume over the total per year. Both sums stay exact decimal until
    * the final double division (the Q14 discipline). nation/region are
    * true dims and broadcast; the facts shuffle on their keys. */
  val qTpchQ8: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    val custNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNations = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_12", disc).otherwise(lit(0)))
          .cast("double").as("nation_volume"),
        sum(disc).cast("double").as("total_volume"))
      .select(col("o_year"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q10 — returned-item revenue report: one quarter of orders joined to
    * their returned lineitems, revenue per customer, top 20. customer and
    * orders/lineitem are fact-sized and shuffle on their keys; nation is
    * the only true dim and is broadcast explicitly. The top-20 rides
    * TakeOrderedAndProject off the aggregation — no global sort. */
  val qTpchQ10: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(disc).cast("double").as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Q7 — volume shipping between two nations: the dim-ROLE-reuse shape,
    * nation joined twice under different roles (supplier's nation vs
    * customer's nation). Both roles are pre-filtered to the two nations
    * of interest BEFORE touching the facts, so the supplier and customer
    * sides shrink at the scan; the cross-pair predicate (must be
    * opposite nations) rides after the joins. Facts shuffle on their
    * keys; only the two filtered nation roles broadcast. */
  val qTpchQ7: (SparkSession, String) => DataFrame = (s, d) => {
    val pair = Seq("NATION_12", "NATION_10")
    val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(s, d).join(broadcast(n1),
          col("s_nationkey") === col("n1_key")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).join(broadcast(n2),
          col("c_nationkey") === col("n2_key")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(disc).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER join
    * with the filter on the null-producing side, per-customer count
    * (customers with no orders count 0 via COUNT(o_orderkey)), then a
    * histogram of those counts. Both sides are fact-sized, so the join is
    * declared shuffle-hash (statistics on the toy fixture would otherwise
    * broadcast the orders side — a driver-melting shape at 100 TB;
    * OlapPlanSpec locks no-broadcast). AQE's skew handling absorbs the
    * null-key bulge of customers without orders; the second groupBy is on
    * the tiny count domain. */
  val qTpchQ13: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
          .hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q9 (adapted) — product-type profit by nation and year. The schema has
    * no partsupp, so supply cost is proxied by p_retailprice × quantity
    * (the join/aggregation shape — part-name filter, five-way star,
    * two-level group key with a YEAR derivation — is Q9's unchanged).
    * profit stays exact decimal through the subtraction and sum; nation is
    * the only true dim and the only broadcast — part, supplier, orders all
    * scale with SF and shuffle on their keys. */
  val qTpchQ9: (SparkSession, String) => DataFrame = (s, d) => {
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    val cost = d12(col("p_retailprice")) * d12(col("l_quantity"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").contains("widget")),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(disc - cost).cast("double").as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** Q11 (adapted) — important stock: per-part value restricted to one
    * nation group's suppliers, kept only where the part's value exceeds a
    * corpus-derived threshold. partsupp is absent, so value is proxied by
    * the shipped extendedprice × quantity, and TPC-H's SF-tuned fraction
    * becomes "above 2× the average part value" — selective at every SF
    * without knowing SF. The threshold is the uncorrelated-scalar-gate
    * shape (one 1-row aggregate broadcast back over the grouped set), and
    * the comparison is written multiplication-only (value × n > total × 2)
    * so it stays exact decimal — a division would round differently per
    * engine. */
  val qTpchQ11: (SparkSession, String) => DataFrame = (s, d) => {
    val nations = Seq("NATION_1", "NATION_3", "NATION_5", "NATION_7",
      "NATION_9")
    val suppliers = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = d12(col("l_extendedprice")) * d12(col("l_quantity"))
    val perPart = Tables.lineitem(s, d)
      .join(suppliers, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(value).cast("decimal(22,4)").as("value_d"))
    val stats = perPart.agg(
      sum(col("value_d")).cast("decimal(28,4)").as("total_d"),
      count(lit(1)).cast("decimal(10,0)").as("n_parts"))
    perPart.join(broadcast(stats))
      .filter(col("value_d") * col("n_parts") >
        col("total_d") * lit(2).cast("decimal(2,0)"))
      .select(col("l_partkey"), col("value_d").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey").asc)
  }

  /** Q12 (adapted) — shipping-priority classes: the CASE-count composition
    * over the orders⋈lineitem join. The schema has no l_shipmode or
    * commit/receipt dates, so the class key is l_returnflag and "late" is
    * shipped-more-than-30-days-after-order-date (the same lateness
    * predicate the subquery surface uses); the high/low priority CASE
    * counting is Q12's unchanged. Counts are longs — no decimal handling
    * needed — written as COUNT of a nullable CASE so both engines produce
    * BIGINT. The shipdate year filter must reach the parquet scan. */
  val qTpchQ12: (SparkSession, String) => DataFrame = (s, d) => {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .groupBy("l_returnflag")
      .agg(count(when(isHigh, lit(1))).as("high_line_count"),
        count(when(!isHigh, lit(1))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // Bucketed landing layouts are written ONCE per (session, sf dir) — at
  // 100 TB this staging is the daily landing job, paid once and reused by
  // every subsequent co-located join, so it must not be re-timed inside
  // each query that reads the layout. Keyed by applicationId (sessions
  // never share) with a dir-hash table suffix (two sf dirs in one session
  // stay distinct).
  private val stagedBuckets = graft.AppCache[(String, String)]()

  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    stagedBuckets.get(s, d)({
      val sfx = java.lang.Integer.toHexString(d.hashCode)
      val ot = s"graft_b_orders_$sfx"
      val lt = s"graft_b_lineitem_$sfx"
      ScalePatterns.writeBucketed(Tables.orders(s, d), ot, "o_orderkey", 8)
      ScalePatterns.writeBucketed(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        lt, "l_orderkey", 8)
      (ot, lt)
    })

  /** Co-located join over bucketed table layouts — the shuffle-free
    * fact⋈fact join. Both sides are written `bucketBy(orderkey)` +
    * sorted (once per session+dir, see bucketedTables), after which the
    * sort-merge join and the per-order aggregation read pre-partitioned,
    * pre-sorted buckets: ZERO exchanges anywhere in the plan
    * (OlapPlanSpec locks this). The grouping keys start with the bucket
    * key, so even the groupBy reuses the bucket partitioning. */
  val qJoinBucketed: (SparkSession, String) => DataFrame = (s, d) => {
    val (ordersT, lineitemT) = bucketedTables(s, d)
    val disc = d12(col("l_extendedprice")) * (one - d4(col("l_discount")))
    // fact⋈fact: neither side broadcasts at real scale, so the join is
    // declared merge (statistics on the toy fixture would otherwise
    // pick a broadcast and forfeit the bucket layout)
    s.table(ordersT).hint("merge")
      .join(s.table(lineitemT),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(sum(disc).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** Declared MERGE (SURVEY §2 J6 at scale): reprice the pending orders
    * and append a synthetic late-arriving batch, via
    * ScalePatterns.upsertByKey over the bucketed landing layout. The base
    * side reads pre-bucketed parquet and never shuffles — only the
    * (small) update batch exchanges into the bucket partitioning, which
    * is the 100 TB mutation story: daily MERGE cost is proportional to
    * the batch, not the table. Declared merge-hint for the same
    * toy-statistics reason as q_join_bucketed; ScalePatternsSpec proves
    * the zero-exchange plan when both sides share the layout. */
  val qUpsertByKey: (SparkSession, String) => DataFrame = (s, d) => {
    val (ordersT, _) = bucketedTables(s, d)
    val base = s.table(ordersT)
    val repriced = base.filter(col("o_orderstatus") === "P")
      .withColumn("o_totalprice",
        (col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"))
      .withColumn("o_orderpriority", lit("0-REPRICED"))
    val lateBatch = base.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      .withColumn("o_orderstatus", lit("N"))
    ScalePatterns.upsertByKey(
        base.hint("merge"), repriced.unionByName(lateBatch), "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** The salted-aggregation scale pattern as a declared query: two-stage
    * sum/count over (key, content-hash salt) then per-key merge, so one
    * hot key spreads over 64 reducers instead of melting one. Result is
    * identical to the direct groupBy (order-independent aggregates on
    * exact decimal) — the oracle is the PLAIN group-by. */
  val qAggSalted: (SparkSession, String) => DataFrame = (s, d) =>
    ScalePatterns.saltedSum(Tables.lineitem(s, d), col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"), 64)
      .select(col("key"), col("sum").cast("double").as("sum_qty"),
        col("cnt"))
      .orderBy("key")

  /** The join stage of [[qJoinSkewed]], exposed so SkewJoinSpec can
    * assert AQE's OptimizeSkewedJoin on the join itself (the skew split
    * relaxes the join's output partitioning, so it is asserted pre-
    * aggregation). ~90% of fact rows collapse onto key 0 — the
    * manufactured hot key. The dim side is a pure projection,
    * DELIBERATELY un-aggregated: OptimizeSkewedJoin pattern-matches a
    * sort-merge join whose sorts sit directly on shuffle stages, and an
    * aggregate between them takes the join out of the rule's reach — the
    * same modeling rule a production pipeline follows when it wants a
    * skewed fact⋈dim eligible for adaptive splitting. */
  def skewedFactJoin(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val fact = lineitem.select(
      when(pmod(col("l_orderkey"), lit(10L)) < 9, lit(0L))
        .otherwise(pmod(col("l_suppkey"), lit(100L))).as("k"),
      col("l_quantity"))
    val dim = supplier.select(pmod(col("s_suppkey"), lit(100L)).as("k"),
      col("s_nationkey"))
    fact.join(dim, "k")
  }

  /** Skew-join surface for AQE — the ADAPTIVE complement of the manual
    * salting q_agg_salted declares: a fact table keyed by a manufactured
    * hot key (90% of lineitem rows share key 0) joined to a
    * supplier-derived dim on that key. At fact scale both sides shuffle
    * and the hot key's partition dwarfs the rest; Spark's
    * OptimizeSkewedJoin then splits it into parallel sub-reads instead
    * of melting one task — SkewJoinSpec asserts exactly that (skew=true
    * in the executed plan) under simulated fact-scale conditions
    * (auto-broadcast off, skew thresholds sized to the fixture), and
    * asserts the re-planned result is bit-identical. At test SF the dim
    * rightly broadcasts and no skew handling is needed. The declared
    * result is the per-key aggregate over the join — identical whichever
    * physical strategy runs, which is the point: skew splitting is a
    * pure execution-layer re-plan. */
  val qJoinSkewed: (SparkSession, String) => DataFrame = (s, d) =>
    skewedFactJoin(Tables.lineitem(s, d), Tables.supplier(s, d))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .select("k", "n_pairs", "sum_qty")
      .orderBy("k")

  /** Fact⋈fact hot-entity join — the harder production skew case
    * (VERDICT r7 item 6): q_join_skewed's dim side could in principle be
    * broadcast-rescued at some scales; here BOTH sides are fact tables
    * (orders is full-width at 100 TB — no broadcast exists), so
    * adaptive skew splitting is the only lever. The skew is the
    * "hot entity" shape: 60% of lineitem rows are remapped onto ONE
    * existing order (the min orderkey, computed in-plan and broadcast as
    * a 1-row cut — same discipline as the streaming cuts, so the oracle
    * states the identical arithmetic), the way one bot user owns half
    * the click log. The orders side keeps one row per key, so the hot
    * join output is |hot rows|, not quadratic. SkewJoinSpec asserts the
    * SMJ gets skew=true under fact-scale conditions with bit-identical
    * results. */
  def hotEntityJoin(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val hot = orders.agg(min(col("o_orderkey")).as("hot_key"))
    val fact = lineitem.crossJoin(broadcast(hot))
      .select(
        when(pmod(col("l_orderkey"), lit(10L)) < 6, col("hot_key"))
          .otherwise(col("l_orderkey")).as("jk"),
        col("l_quantity"), col("l_returnflag"))
    val right = orders.select(col("o_orderkey").as("jk"),
      col("o_orderstatus"), col("o_totalprice"))
    fact.join(right, "jk")
  }

  val qJoinSkewedFacts: (SparkSession, String) => DataFrame = (s, d) =>
    hotEntityJoin(Tables.lineitem(s, d), Tables.orders(s, d))
      .groupBy("l_returnflag", "o_orderstatus")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("l_returnflag", "o_orderstatus")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_join_skewed", qJoinSkewed, Some(
      "WITH fact AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_suppkey % 100 END AS k, l_quantity FROM lineitem), dim AS (SELECT s_suppkey % 100 AS k FROM supplier) SELECT k, COUNT(*) AS n_pairs, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM fact JOIN dim USING (k) GROUP BY k ORDER BY k")),
    QueryDef("q_join_skewed_facts", qJoinSkewedFacts, Some(
      "WITH h AS (SELECT MIN(o_orderkey) AS hot_key FROM orders), fact AS (SELECT CASE WHEN l_orderkey % 10 < 6 THEN h.hot_key ELSE l_orderkey END AS jk, l_quantity, l_returnflag FROM lineitem CROSS JOIN h) SELECT l_returnflag, o_orderstatus, COUNT(*) AS n_pairs, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM fact JOIN orders ON jk = o_orderkey GROUP BY l_returnflag, o_orderstatus ORDER BY l_returnflag, o_orderstatus")),
    QueryDef("q_tpch_q1", qTpchQ1, Some(
      s"SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, CAST(SUM($sqlDisc) AS DOUBLE) AS sum_disc_price, CAST(SUM($sqlCharge) AS DOUBLE) AS sum_charge, COUNT(*) AS count_order, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price, CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),
    QueryDef("q_tpch_q3", qTpchQ3, Some(
      s"SELECT l_orderkey, CAST(SUM($sqlDisc) AS DOUBLE) AS revenue, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority ORDER BY revenue DESC, l_orderkey ASC LIMIT 10")),
    QueryDef("q_tpch_q5", qTpchQ5, Some(
      s"SELECT n_name, CAST(SUM($sqlDisc) AS DOUBLE) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY n_name ORDER BY revenue DESC, n_name ASC")),
    QueryDef("q_tpch_q6", qTpchQ6, Some(
      "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")),
    QueryDef("q_tpch_q14", qTpchQ14, Some(
      s"SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $sqlDisc ELSE 0 END) AS DOUBLE) / CAST(SUM($sqlDisc) AS DOUBLE) AS promo_revenue FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'")),
    QueryDef("q_tpch_q18", qTpchQ18, Some(
      "SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_totalprice, CAST(sq AS DOUBLE) AS sum_qty FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300) JOIN orders ON o_orderkey = l_orderkey JOIN customer ON o_custkey = c_custkey ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100")),
    QueryDef("q_tpch_q19", qTpchQ19, Some(
      s"SELECT CAST(SUM($sqlDisc) AS DOUBLE) AS revenue FROM lineitem JOIN part ON p_partkey = l_partkey WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20) OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)")),
    QueryDef("q_tpch_q8", qTpchQ8, Some(
      s"SELECT YEAR(o_orderdate) AS o_year, CAST(SUM(CASE WHEN n2.n_name = 'NATION_12' THEN $sqlDisc ELSE 0 END) AS DOUBLE) / CAST(SUM($sqlDisc) AS DOUBLE) AS mkt_share FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1 ORDER BY 1")),
    QueryDef("q_tpch_q7", qTpchQ7, Some(
      s"SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, YEAR(l_shipdate) AS l_year, CAST(SUM($sqlDisc) AS DOUBLE) AS revenue FROM supplier JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN lineitem ON l_suppkey = s_suppkey JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey JOIN nation n2 ON c_nationkey = n2.n_nationkey WHERE n1.n_name IN ('NATION_12','NATION_10') AND n2.n_name IN ('NATION_12','NATION_10') AND n1.n_name <> n2.n_name AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")),
    QueryDef("q_tpch_q10", qTpchQ10, Some(
      s"SELECT c_custkey, c_name, CAST(SUM($sqlDisc) AS DOUBLE) AS revenue, c_acctbal, n_name FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_returnflag = 'R' GROUP BY c_custkey, c_name, c_acctbal, n_name ORDER BY revenue DESC, c_custkey ASC LIMIT 20")),
    QueryDef("q_tpch_q13", qTpchQ13, Some(
      "SELECT c_count, COUNT(*) AS custdist FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) GROUP BY c_count ORDER BY custdist DESC, c_count DESC")),
    QueryDef("q_tpch_q9", qTpchQ9, Some(
      s"SELECT n_name AS nation, YEAR(o_orderdate) AS o_year, CAST(SUM($sqlDisc - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit FROM lineitem JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN orders ON o_orderkey = l_orderkey WHERE p_name LIKE '%widget%' GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC")),
    QueryDef("q_tpch_q11", qTpchQ11, Some(
      "WITH perpart AS (SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(22,4)) AS value_d FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9')) GROUP BY 1), stats AS (SELECT CAST(SUM(value_d) AS DECIMAL(28,4)) AS total_d, CAST(COUNT(*) AS DECIMAL(10,0)) AS n_parts FROM perpart) SELECT l_partkey, CAST(value_d AS DOUBLE) AS part_value FROM perpart, stats WHERE value_d * n_parts > total_d * CAST(2 AS DECIMAL(2,0)) ORDER BY part_value DESC, l_partkey ASC")),
    QueryDef("q_tpch_q12", qTpchQ12, Some(
      "SELECT l_returnflag, COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count, COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > o_orderdate + INTERVAL 30 DAY GROUP BY l_returnflag ORDER BY l_returnflag")),
    QueryDef("q_upsert_bykey", qUpsertByKey, Some(
      "WITH upd AS (SELECT o_orderkey, o_custkey, o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS o_totalprice, o_orderdate, '0-REPRICED' AS o_orderpriority FROM orders WHERE o_orderstatus = 'P' UNION ALL SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 100 = 0) SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority FROM (SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd) UNION ALL SELECT * FROM upd) ORDER BY o_orderkey")),
    QueryDef("q_join_bucketed", qJoinBucketed, Some(
      s"SELECT o_orderkey, o_orderpriority, CAST(SUM($sqlDisc) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey ASC LIMIT 20")),
    QueryDef("q_agg_salted", qAggSalted, Some(
      "SELECT l_returnflag AS key, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))
  )
}
