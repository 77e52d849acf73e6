package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** The remaining TPC-H shapes (Q2/Q4/Q16/Q17/Q20/Q21/Q22) as named
  * queries, completing the literal 22-query suite. Their sub-shapes were
  * already covered by the subquery surface (q_exists_semi, q_not_in,
  * q_scalar_avg_filter, q_scalar_gate, q_not_exists); these make the
  * canonical compositions explicit, each with its decorrelation written
  * the way an optimizer rewrites it — window-min for Q2's correlated MIN,
  * semi-join for Q4's EXISTS, one aggregation pass for Q21's
  * EXISTS+NOT-EXISTS pair — while the oracles state the classic
  * correlated formulations, so the driver hash-proves the rewrites.
  *
  * Schema adaptations (same discipline as Q9/Q11/Q12 in Olap.scala — the
  * testdata has no partsupp and no commit/receipt dates):
  * - the part⋈supplier "supply" relationship is DISTINCT (l_partkey,
  *   l_suppkey) from lineitem; supply cost is MIN shipped extendedprice
  *   (order-independent, exact decimal);
  * - "late" is shipped-more-than-30-days-after-order-date, the lateness
  *   predicate Q12 and the subquery surface already use;
  * - Q16's "customer complaints" supplier exclusion becomes negative
  *   account balance; Q22's phone country code becomes c_nationkey, and
  *   "no orders in 7 years" becomes no orders since 1999-01-01 (every
  *   fixture customer has SOME order).
  *
  * Money/threshold determinism (QueryDef contract): every comparison
  * against a derived average is written multiplication-only in exact
  * decimal — Q17's `qty < 0.2·avg(qty)` runs as `qty·5·cnt < sum`,
  * Q22's `bal > avg(bal)` as `bal·n > total` — so no engine ever
  * divides before comparing and the row sets are bit-identical.
  */
object Olap2 {

  private def d12(c: Column): Column = c.cast("decimal(12,2)")

  private def dimRegion(s: SparkSession, d: String, name: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === name),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")

  /** Q2 — minimum-cost supplier. The correlated-MIN shape: among EUROPE
    * suppliers of each STANDARD small part, keep those offering the
    * part's minimum cost. Decorrelated as a window MIN over the per-
    * (part, supplier) aggregate — partitioned by part key, so the window
    * is corpus-partitioned, never global; the part filter joins BEFORE
    * the window (it selects whole partkeys, so the per-part min is
    * unchanged and the window input shrinks at the scan). supplier is
    * fact-sized and shuffles; only nation⋈region broadcasts. */
  val qTpchQ2: (SparkSession, String) => DataFrame = (s, d) => {
    val euro = Tables.supplier(s, d)
      .join(broadcast(dimRegion(s, d, "EUROPE")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    val supply = Tables.lineitem(s, d)
      .join(euro, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
      .agg(min(d12(col("l_extendedprice"))).as("cost"))
    supply
      .join(Tables.part(s, d)
          .filter(col("p_size") <= 10 && col("p_type") === "STANDARD"),
        col("p_partkey") === col("l_partkey"))
      .withColumn("min_cost",
        min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        col("cost").cast("double").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q4 — order-priority checking. EXISTS(late line) runs as a LEFT SEMI
    * join with the lateness predicate IN the join condition: one shuffle
    * on the order key, the quarter filter pushed to the orders scan. */
  val qTpchQ4: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Q16 — parts/supplier relationship count. The NOT-IN exclusion runs
    * as a LEFT ANTI join against the (tiny, but fact-shaped) excluded-
    * supplier set — s_suppkey is non-null so anti ≡ NOT IN; the distinct
    * supply projection partial-aggregates map-side before its one
    * shuffle, and COUNT(DISTINCT) expands per-key, never globally. */
  val qTpchQ16: (SparkSession, String) => DataFrame = (s, d) => {
    val complained = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      .join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d).filter(col("p_brand") =!= "Brand#5" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q17 — small-quantity-order revenue. The correlated scalar-AVG gate,
    * decorrelated as aggregate-then-join on the part key; the 20%-of-
    * average cut is the multiplication-only form qty·5·cnt < sum(qty),
    * exact in decimal in both engines. The per-part aggregate runs over
    * the FULL lineitem (the correlated subquery's scope — not just the
    * branded parts), one map-side-combinable shuffle. */
  val qTpchQ17: (SparkSession, String) => DataFrame = (s, d) => {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("ap"))
      .agg(count(lit(1)).cast("decimal(10,0)").as("cnt"),
        sum(d12(col("l_quantity"))).as("sq"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM"),
        col("p_partkey") === col("l_partkey"))
      .join(perPart, col("ap") === col("l_partkey"))
      .filter(d12(col("l_quantity")) * lit(5).cast("decimal(3,0)") *
        col("cnt") < col("sq"))
      .agg((sum(d12(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** Q20 — potential part promotion. The nested-IN shape: suppliers who
    * shipped >20 units of some widget part in 1997, intersected with a
    * region's suppliers. The inner aggregate reduces lineitem to
    * (supplier, part) totals FIRST (partial agg map-side); the outer
    * membership runs as LEFT SEMI — no distinct materialization of the
    * inner set beyond the semi-join's build side. */
  val qTpchQ20: (SparkSession, String) => DataFrame = (s, d) => {
    val qualified = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(s, d).filter(col("p_name").contains("widget")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(d12(col("l_quantity"))).as("shipped"))
      .filter(col("shipped") > 20)
    Tables.supplier(s, d)
      .join(broadcast(dimRegion(s, d, "EUROPE")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** Q21 — suppliers who kept orders waiting. The classic formulation is
    * an EXISTS + NOT EXISTS pair over two more lineitem scans; here both
    * collapse into ONE aggregation per order — n_supp ≥ 2 encodes the
    * EXISTS (another supplier participated), n_late_supp = 1 encodes the
    * NOT EXISTS (nobody else was late), and the unique late supplier is
    * recovered as MIN(late suppkey) under that condition. One shuffle on
    * the order key instead of three correlated scans; the oracle states
    * the textbook EXISTS form, so the driver hash-proves the rewrite. */
  /** The one-pass stage of [[qTpchQ21]], exposed for the scale probe:
    * (order, waiting supplier) pairs where that supplier was the ONLY
    * late one on a multi-supplier finished order. */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
          .as("late"))
      // level 1: one row per (order, supplier) with an any-late flag.
      // An EXPLICIT two-level aggregation instead of two countDistincts:
      // RewriteDistinctAggregates' Expand would triple the pre-shuffle
      // rows AND permute its gid layout with session state (a HashMap
      // iteration order), which made this plan's digest bistable across
      // sessions. The two-level form partial-combines map-side, carries
      // a third of the rows into the first exchange, and its plan is a
      // deterministic function of the query alone.
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("late"))
      // level 2: per order — n_supp ≥ 2 encodes the EXISTS, exactly one
      // late supplier encodes the NOT EXISTS, and that supplier is
      // recovered as MIN under the condition
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("late"), 1)).as("n_late_supp"),
        min(when(col("late"), col("l_suppkey"))).as("waiting_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)

  val qTpchQ21: (SparkSession, String) => DataFrame = (s, d) => {
    waitingSuppliers(Tables.lineitem(s, d), Tables.orders(s, d))
      .join(Tables.supplier(s, d), col("waiting_supp") === col("s_suppkey"))
      .join(broadcast(dimRegion(s, d, "ASIA")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q22 — global sales opportunity. Scalar-gate + anti-join: the
    * positive-balance average over the country pool broadcasts as ONE
    * row (multiplication-only comparison bal·n > total, exact decimal),
    * dormant customers are a LEFT ANTI against recent orders, and the
    * final histogram groups by the handful of country codes. */
  val qTpchQ22: (SparkSession, String) => DataFrame = (s, d) => {
    val pool = Tables.customer(s, d)
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
      .select(col("c_custkey"), col("c_nationkey"),
        d12(col("c_acctbal")).as("bal"))
    val stats = pool.filter(col("bal") > 0)
      .agg(sum(col("bal")).cast("decimal(18,2)").as("total"),
        count(lit(1)).cast("decimal(10,0)").as("n"))
    pool.join(broadcast(stats))
      .filter(col("bal") * col("n") > col("total"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  // The materialized daily rollup is written ONCE per (session, sf dir) —
  // at 100 TB this is the nightly summary-build job, paid once and then
  // serving every coarser-grained query from a day×flag-sized table (the
  // same pay-once discipline as Olap.bucketedTables). Incremental
  // maintenance is appending the new day's partial — exact decimal
  // partials re-aggregate associatively, which is what the oracle proves.
  private val stagedRollups = graft.AppCache[String]()

  private[graft] def dailyRollupPath(s: SparkSession, d: String): String =
    stagedRollups.get(s, d)({
      val path = s"${sys.props("java.io.tmpdir")}/graft_rollup_" +
        s"${s.sparkContext.applicationId.hashCode.toHexString}_" +
        java.lang.Integer.toHexString(d.hashCode)
      rollupOf(Tables.lineitem(s, d)).write.mode("overwrite").parquet(path)
      path
    })

  /** The daily-rollup aggregation shared by the staged layout, the
    * incremental merge, and the scale probe. */
  def rollupOf(df: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(4,2)")
    val disc = d12(col("l_extendedprice")) *
      (one - col("l_discount").cast("decimal(4,2)"))
    df.groupBy(to_date(col("l_shipdate")).as("day"), col("l_returnflag"))
      .agg(sum(d12(col("l_quantity"))).as("qty_d"),
        sum(disc).as("rev_d"),
        count(lit(1)).as("n_items"))
  }

  /** Incremental rollup maintenance — the additive-merge complement of
    * [[qRollupReuse]] (the q_graph_increment discipline): two partial
    * rollups over OVERLAPPING day keys (a deterministic 90/10 modulo
    * split of the fact stream — the "yesterday's rollup + today's late
    * batch" shape) merge by key-summing their exact-decimal partials,
    * and the monthly answer from the merged table shares the
    * full-rebuild oracle BY REFERENCE: the driver hash-proves
    * incremental ≡ rebuilt-from-scratch. Merge cost is rollup-sized
    * (days×flags), never fact-sized — the 100 TB maintenance story. */
  val qRollupIncrement: (SparkSession, String) => DataFrame = (s, d) => {
    val li = Tables.lineitem(s, d)
    val base = rollupOf(li.filter(pmod(col("l_orderkey"), lit(10L)) < 9))
    val delta = rollupOf(li.filter(pmod(col("l_orderkey"), lit(10L)) >= 9))
    base.unionByName(delta)
      .groupBy("day", "l_returnflag")
      .agg(sum(col("qty_d")).as("qty_d"), sum(col("rev_d")).as("rev_d"),
        sum(col("n_items")).as("n_items"))
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
        sum(col("rev_d")).cast("double").as("revenue"),
        sum(col("n_items")).as("n_items"))
      .orderBy("month", "l_returnflag")
  }

  /** Summary-table reuse — answer a monthly aggregate FROM the
    * materialized daily rollup instead of the fact scan. The rollup
    * partials are exact decimals, so re-aggregation is associative and
    * the result is bit-identical to the direct monthly scan — which is
    * exactly what the oracle states (direct SQL over lineitem), making
    * the driver hash-prove the rollup algebra. The monthly pass reads
    * days×flags rows: at 100 TB the query cost is independent of corpus
    * size, the entire point of maintaining the summary. */
  val qRollupReuse: (SparkSession, String) => DataFrame = (s, d) =>
    s.read.parquet(dailyRollupPath(s, d))
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
        sum(col("rev_d")).cast("double").as("revenue"),
        sum(col("n_items")).as("n_items"))
      .orderBy("month", "l_returnflag")

  /** TRANSPARENT materialized-view rewrite: the query here is written
    * against the FACT table (the same monthly aggregate the oracle
    * states); the injected optimizer rule (plans.MvRewriteRule) proves
    * it derivable from the registered daily rollup and swaps the plan
    * to re-aggregate the rollup — MvRewriteSpec locks that the executed
    * plan scans the rollup and never lineitem, and the driver hash
    * proves the rewrite exact (decimal partials are associative). The
    * 100 TB shape: the user's fact query costs days×flags rows. */
  val qRollupRewrite: (SparkSession, String) => DataFrame = (s, d) => {
    graft.plans.MvRewrite.register(s, s"$d/lineitem",
      dailyRollupPath(s, d))
    graft.plans.MvRewrite.monthlyOverFact(Tables.lineitem(s, d))
      .orderBy("month", "l_returnflag")
  }

  /** Coarser queries answered from the SAME rollup by the rule — the
    * derivability lattice: a grouping SUBSET of the view's dimensions
    * re-aggregates from the partials (decimal sums associative, counts
    * exact). Flag-only with a partial aggregate list, and the global
    * (no-grouping) pair. MvRewriteSpec locks both plan swaps. */
  val qRollupRewriteCoarse: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag")
    }

  val qRollupRewriteGlobal: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      val one = lit(1).cast("decimal(4,2)")
      val disc = d12(col("l_extendedprice")) *
        (one - col("l_discount").cast("decimal(4,2)"))
      Tables.lineitem(s, d)
        .agg(sum(disc).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }

  /** FILTERED rewrite — the lattice extended one step toward production
    * shape: the fact query carries predicates on the view's DIMENSIONS
    * (flag equality + a month range), and the rule answers it by
    * applying the SAME predicates to the rollup before re-aggregating
    * (dimension predicates commute with the partial aggregation; a
    * predicate touching a measure keeps the fact scan — MvRewriteSpec
    * pins that bail). Oracle states the direct filtered fact SQL. */
  val qRollupRewriteFiltered: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      val month = date_format(to_date(col("l_shipdate")), "yyyy-MM")
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && month >= "1994-01")
        .groupBy(month.as("month"))
        .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("month")
    }

  // --- the SECOND registered view: orders monthly × priority — proving
  // the rule is a CATALOG, not a single hard-wired rewrite. Same
  // discipline as the lineitem view: exact-decimal partials in a daily
  // rollup, the monthly answer re-aggregated, counts coalesced.
  private val stagedOrdersRollups = graft.AppCache[String]()

  private[graft] def ordersRollupPath(s: SparkSession, d: String): String =
    stagedOrdersRollups.get(s, d)({
      val path = s"${sys.props("java.io.tmpdir")}/graft_orollup_" +
        s"${s.sparkContext.applicationId.hashCode.toHexString}_" +
        java.lang.Integer.toHexString(d.hashCode)
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"),
          col("o_orderpriority"))
        .agg(sum(d12(col("o_totalprice"))).as("price_d"),
          count(lit(1)).as("n_orders"))
        .write.mode("overwrite").parquet(path)
      path
    })

  private[graft] val OrdersMonthlyView: graft.plans.MvViewDef =
    graft.plans.MvViewDef(
      viewInputs = Set("o_orderdate", "o_orderpriority", "o_totalprice"),
      overFact = df => df.groupBy(
          date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"),
          col("o_orderpriority"))
        .agg(sum(d12(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_orders")),
      rollupBase = (s, p) => s.read.parquet(p)
        .withColumn("month", date_format(col("day"), "yyyy-MM")),
      reAgg = (base, groupNames) =>
        base.groupBy(groupNames.map(col): _*)
          .agg(sum(col("price_d")).cast("double").as("sum_price"),
            coalesce(sum(col("n_orders")), lit(0L)).as("n_orders")))

  /** MULTI-VIEW catalog: BOTH views registered (lineitem monthly ×
    * flag, orders monthly × priority); the declared query is the
    * orders fact aggregate and must be answered from the ORDERS rollup
    * — the rule binds by marker + derivability, never by arrival
    * order. MvRewriteSpec locks that the lineitem query still swaps to
    * ITS rollup in the same session. */
  val qRollupRewriteOrders: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      graft.plans.MvRewrite.registerView(s, s"$d/orders",
        ordersRollupPath(s, d), OrdersMonthlyView)
      OrdersMonthlyView.overFact(Tables.orders(s, d))
        .orderBy("month", "o_orderpriority")
    }

  /** The rewrite from PURE SQL — the BI-tool path: the same monthly
    * aggregate written as SQL text over the parquet table reference.
    * The rule runs at optimizer level, so the SQL front end needs no
    * special handling — the parsed plan's expressions constant-fold to
    * the same canonical forms the DataFrame template produces and the
    * semantic-equality match fires identically (MvRewriteSpec locks
    * the swap). Oracle shared with the DataFrame key BY REFERENCE. */
  val qRollupRewriteSql: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      s.sql(
        "SELECT date_format(to_date(l_shipdate), 'yyyy-MM') AS month, " +
          "l_returnflag, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) " +
          "AS sum_qty, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "AS DOUBLE) AS revenue, COUNT(*) AS n_items " +
          s"FROM parquet.`$d/lineitem.parquet` " +
          "GROUP BY 1, 2 ORDER BY 1, 2")
    }

  /** HAVING over the rewritten aggregate: the predicate sits ABOVE the
    * Aggregate node (Catalyst plans HAVING as Filter-over-Aggregate),
    * so the rule rewrites the aggregate underneath and the filter
    * composes through the preserved output names/expr ids — no special
    * handling, which is itself the thing to gate. Oracle states the
    * direct fact SQL with the same HAVING. */
  val qRollupRewriteHaving: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.register(s, s"$d/lineitem",
        dailyRollupPath(s, d))
      graft.plans.MvRewrite.monthlyOverFact(Tables.lineitem(s, d))
        .filter(col("n_items") >= 25)
        .orderBy("month", "l_returnflag")
    }

  // --- the STAR-SCHEMA view: lineitem ⋈ orders, monthly × priority ×
  // flag — the BI rollup shape where the rewrite's 100 TB payoff is
  // biggest (it removes the fact-side JOIN as well as the scan). The
  // rollup keeps exact-decimal partials keyed by day so maintenance
  // stays incremental; the rule recognizes the candidate's join subtree
  // structurally (inner equi-join on the declared key pair, both sides
  // bare relations) and answers from the rollup alone.
  private val stagedStarRollups = graft.AppCache[String]()

  private[graft] def starJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).join(Tables.orders(s, d),
      col("l_orderkey") === col("o_orderkey"))

  private[graft] def starRollupOf(df: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(4,2)")
    val disc = d12(col("l_extendedprice")) *
      (one - col("l_discount").cast("decimal(4,2)"))
    df.groupBy(to_date(col("l_shipdate")).as("day"),
        col("o_orderpriority"), col("l_returnflag"))
      .agg(sum(d12(col("l_quantity"))).as("qty_d"),
        sum(disc).as("rev_d"),
        count(lit(1)).as("n_items"))
  }

  private[graft] def starRollupPath(s: SparkSession, d: String): String =
    stagedStarRollups.get(s, d)({
      val path = s"${sys.props("java.io.tmpdir")}/graft_srollup_" +
        s"${s.sparkContext.applicationId.hashCode.toHexString}_" +
        java.lang.Integer.toHexString(d.hashCode)
      starRollupOf(starJoin(s, d)).write.mode("overwrite").parquet(path)
      path
    })

  private[graft] def starOverFact(df: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(4,2)")
    val disc = d12(col("l_extendedprice")) *
      (one - col("l_discount").cast("decimal(4,2)"))
    df.groupBy(
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("o_orderpriority"), col("l_returnflag"))
      .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(disc).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private[graft] def starMonthlyView(d: String): graft.plans.MvViewDef =
    graft.plans.MvViewDef(
      viewInputs = Set("l_shipdate", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_discount", "o_orderpriority"),
      overFact = starOverFact,
      rollupBase = (s, p) => s.read.parquet(p)
        .withColumn("month", date_format(col("day"), "yyyy-MM")),
      reAgg = (base, groupNames) =>
        base.groupBy(groupNames.map(col): _*)
          .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
            sum(col("rev_d")).cast("double").as("revenue"),
            coalesce(sum(col("n_items")), lit(0L)).as("n_items")),
      join = Some(graft.plans.MvJoinSpec(
        dimMarker = s"$d/orders",
        factKey = "l_orderkey", dimKey = "o_orderkey")))

  /** The star-schema rewrite key: the declared query is the fact ⋈ dim
    * monthly aggregate written against the BASE tables; the rule proves
    * the join subtree is exactly the registered view's (inner equi-join
    * on l_orderkey = o_orderkey, both sides bare) and the groupings /
    * aggregates derivable, then swaps the whole subtree — join included
    * — for the rollup re-aggregation. Oracle states the direct star
    * SQL; MvRewriteSpec locks that the executed plan scans neither
    * lineitem nor orders and pins the near-miss joins (different key,
    * filtered side) to the fact scan. */
  val qRollupRewriteJoin: (SparkSession, String) => DataFrame =
    (s, d) => {
      graft.plans.MvRewrite.registerView(s, s"$d/lineitem",
        starRollupPath(s, d), starMonthlyView(d))
      starOverFact(starJoin(s, d))
        .orderBy("month", "o_orderpriority", "l_returnflag")
    }

  private val rollupOracle =
    "SELECT strftime(l_shipdate, '%Y-%m') AS month, l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_rollup_reuse", qRollupReuse, Some(rollupOracle)),
    // the fact-table query answered FROM the rollup by the optimizer
    // rule — same oracle; MvRewriteSpec locks the plan swap
    QueryDef("q_rollup_rewrite", qRollupRewrite, Some(rollupOracle)),
    // derivability lattice: a flag-only grouping with a partial
    // aggregate list, and the global pair, both re-aggregated from the
    // same rollup by the rule; oracles state the direct fact SQL
    QueryDef("q_rollup_rewrite_coarse", qRollupRewriteCoarse, Some(
      "SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n_items FROM lineitem GROUP BY 1 ORDER BY 1")),
    QueryDef("q_rollup_rewrite_global", qRollupRewriteGlobal, Some(
      "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM lineitem")),
    // filtered lattice: dimension predicates (flag + month range) move
    // to the rollup; the oracle states the direct filtered fact SQL
    QueryDef("q_rollup_rewrite_filtered", qRollupRewriteFiltered, Some(
      "SELECT strftime(l_shipdate, '%Y-%m') AS month, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n_items FROM lineitem WHERE l_returnflag = 'R' AND strftime(l_shipdate, '%Y-%m') >= '1994-01' GROUP BY 1 ORDER BY 1")),
    // the same rewrite from pure SQL text — oracle BY REFERENCE with
    // the DataFrame key (MvRewriteSpec locks the plan swap)
    QueryDef("q_rollup_rewrite_sql", qRollupRewriteSql,
      Some(rollupOracle)),
    // multi-view catalog: the orders fact aggregate answered from the
    // ORDERS rollup while the lineitem view stays registered
    QueryDef("q_rollup_rewrite_orders", qRollupRewriteOrders, Some(
      "SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price, COUNT(*) AS n_orders FROM orders GROUP BY 1, 2 ORDER BY 1, 2")),
    // HAVING composes through the rewrite (Filter-over-Aggregate; the
    // rule swaps the aggregate underneath, names/expr ids preserved)
    QueryDef("q_rollup_rewrite_having", qRollupRewriteHaving, Some(
      "SELECT strftime(l_shipdate, '%Y-%m') AS month, l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= 25 ORDER BY 1, 2")),
    // star-schema view: the fact ⋈ dim aggregate answered from the
    // join rollup — oracle states the direct star SQL
    QueryDef("q_rollup_rewrite_join", qRollupRewriteJoin, Some(
      "SELECT strftime(l_shipdate, '%Y-%m') AS month, o_orderpriority, l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")),
    // shares the full-rebuild oracle BY REFERENCE: the driver hash-match
    // proves the additive partial-merge reconstructs the identical rollup
    QueryDef("q_rollup_increment", qRollupIncrement, Some(rollupOracle)),
    QueryDef("q_tpch_q2", qTpchQ2, Some(
      "WITH supply AS (SELECT l_partkey, s_suppkey, s_acctbal, s_name, n_name, MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE' GROUP BY 1,2,3,4,5) SELECT s_acctbal, s_name, n_name, p_partkey, p_name, CAST(cost AS DOUBLE) AS supply_cost FROM supply JOIN part ON p_partkey = l_partkey WHERE p_size <= 10 AND p_type = 'STANDARD' AND cost = (SELECT MIN(cost) FROM supply s2 WHERE s2.l_partkey = supply.l_partkey) ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100")),
    QueryDef("q_tpch_q4", qTpchQ4, Some(
      "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY) GROUP BY 1 ORDER BY 1")),
    QueryDef("q_tpch_q16", qTpchQ16, Some(
      "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps JOIN part ON p_partkey = l_partkey WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1,4,7,10,13,16,19,22) AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) GROUP BY 1,2,3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")),
    QueryDef("q_tpch_q17", qTpchQ17, Some(
      "WITH agg AS (SELECT l_partkey AS ap, CAST(COUNT(*) AS DECIMAL(10,0)) AS cnt, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq FROM lineitem GROUP BY 1) SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/7.0 AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey JOIN agg ON ap = l_partkey WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM' AND CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(3,0)) * cnt < sq")),
    QueryDef("q_tpch_q20", qTpchQ20, Some(
      "SELECT s_name, s_acctbal FROM supplier JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey WHERE p_name LIKE '%widget%' AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY l_suppkey, l_partkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 20) ORDER BY s_name")),
    QueryDef("q_tpch_q21", qTpchQ21, Some(
      "WITH l AS (SELECT l_orderkey, l_suppkey, (l_shipdate > o_orderdate + INTERVAL 30 DAY) AS late FROM lineitem JOIN orders ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F') SELECT s_name, COUNT(*) AS numwait FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey FROM l l1 WHERE l1.late AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late)) w JOIN supplier ON s_suppkey = l_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100")),
    QueryDef("q_tpch_q22", qTpchQ22, Some(
      "WITH pool AS (SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13)), s AS (SELECT CAST(SUM(bal) AS DECIMAL(18,2)) AS total, CAST(COUNT(*) AS DECIMAL(10,0)) AS n FROM pool WHERE bal > 0) SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust, CAST(SUM(bal) AS DOUBLE) AS totacctbal FROM pool, s WHERE bal * n > total AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') GROUP BY 1 ORDER BY 1"))
  )
}
