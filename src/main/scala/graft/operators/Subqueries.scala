package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, Tables}

/** Correlated-subquery surface — EXISTS / NOT EXISTS / correlated scalar
  * aggregate / NOT IN — declared as SQL text over temp views so Catalyst's
  * decorrelation actually runs (`RewritePredicateSubquery`,
  * `RewriteCorrelatedScalarSubquery`). These are the shapes an analytics
  * user types first (TPC-H Q4/Q21/Q2/Q16), and the scale contract is that
  * every one of them lands as a semi/anti/outer JOIN in the physical plan —
  * never a per-row subplan re-executed for each outer row.
  * PlanRegressionSpec locks the rewrites.
  *
  * The schemas lack `l_commitdate`/`l_receiptdate`/`partsupp`, so the
  * "late" predicate is shipped-more-than-60-days-after-order-date and the
  * Q16 grouping runs over `part` directly; the join/decorrelation shapes
  * are the TPC-H ones unchanged.
  *
  * Unlike the rest of the surface (DataFrame builders), these are kept as
  * SQL on purpose: the DataFrame API cannot express EXISTS/IN subqueries,
  * and hand-rewriting them to joins (what `q_lookup_guarded` does) skips
  * the very optimizer path this module exists to exercise.
  */
object Subqueries {

  /** Bind the session-scoped views the SQL text references. Re-registered
    * on every call — a cheap catalog update with no Spark job — so a
    * session that switches testdata dirs never reads stale views. The
    * resulting plan captures the view's logical plan at `sql()` time. */
  private def bindViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("g_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
    Tables.customer(s, d).createOrReplaceTempView("g_customer")
    Tables.supplier(s, d).createOrReplaceTempView("g_supplier")
    Tables.part(s, d).createOrReplaceTempView("g_part")
  }

  private def sqlQuery(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { bindViews(s, d); s.sql(text) }

  /** TPC-H Q4 shape — priority count of orders with at least one late
    * lineitem. The EXISTS must rewrite to a LEFT SEMI join on l_orderkey
    * (with the non-equi lateness comparison riding the join condition):
    * lineitem is scanned once and shuffled once, not probed per order. */
  val qExistsSemi: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM g_orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM g_lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority""")

  /** TPC-H Q21 shape — suppliers who were the sole late shipper on a
    * multi-supplier finished order. EXISTS + NOT EXISTS over the same
    * fact: the rewrite is one LEFT SEMI and one LEFT ANTI join against
    * lineitem keyed on l_orderkey — three passes over lineitem total,
    * every one a key-partitioned shuffle (no per-row re-scan). The SQL
    * text is public so ScaleProbe can run the same decorrelation shape
    * over g_* views bound to replicated frames. */
  val notExistsSql: String = """
    SELECT s_name, COUNT(*) AS numwait
    FROM g_supplier, g_lineitem l1, g_orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM g_lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC"""

  val qNotExists: (SparkSession, String) => DataFrame =
    sqlQuery(notExistsSql)

  /** TPC-H Q2 shape — correlated scalar aggregate in the SELECT list: the
    * declarative twin of `q_lookup_guarded` (whose Spark side is the
    * hand-rewritten agg+join at Relational.scala — both share this very
    * SQL as their DuckDB oracle). Catalyst must decorrelate to a
    * per-key MAX aggregate LEFT OUTER joined back on o_custkey: orders
    * aggregates once, customers never re-probe it. */
  val qScalarSubquery: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT c_custkey,
           (SELECT MAX(o_orderkey) FROM g_orders
             WHERE o_custkey = c_custkey
               AND o_orderstatus = 'P') AS latest_p_order
    FROM g_customer
    ORDER BY c_custkey""")

  /** TPC-H Q16 shape — brand/type counts of parts that never appear in a
    * near-full-quantity lineitem. NOT IN against a fact-side subquery is
    * the null-aware anti join: l_partkey is non-null here, but the plan
    * must still be a single LEFT ANTI join on the distinct subquery keys,
    * not a per-part membership scan. */
  val qNotIn: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT p_brand, p_type, COUNT(*) AS cnt
    FROM g_part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM g_lineitem
                            WHERE l_quantity >= 48)
    GROUP BY p_brand, p_type
    ORDER BY p_brand, p_type""")

  /** TPC-H Q22 shape — nations' affluent-but-inactive customers: an
    * UNCORRELATED scalar aggregate gate (the global average, computed
    * exactly once as a scalar subquery — the one subquery form that
    * correctly SURVIVES as a subplan) combined with a correlated
    * NOT EXISTS that must still rewrite to a LEFT ANTI join. The gate's
    * average is an exact decimal sum divided as double, so the threshold
    * is bit-identical across engines. */
  val qScalarGate: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM g_customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(*)
                       FROM g_customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM g_orders
                      WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'P')
    GROUP BY c_nationkey
    ORDER BY c_nationkey""")

  /** TPC-H Q17 shape — small-quantity-order revenue: a correlated scalar
    * AVG in the WHERE clause, per part. The rewrite must aggregate
    * lineitem once per part key and join the thresholds back — lineitem
    * is scanned twice total (once for rows, once for per-part averages),
    * never once per part. l_quantity is integer-valued, so the average
    * is exact in double and the 0.2× threshold compares identically
    * across engines. */
  val qScalarAvgFilter: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM g_lineitem, g_part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM g_lineitem l2
                        WHERE l2.l_partkey = p_partkey)""")

  /** Correlated LATERAL derived table with ORDER BY + LIMIT — "top order
    * per customer" as the user writes it. The rewrite must be the
    * two-phase ranking plan: WindowGroupLimit (partial then final — map
    * tasks forward at most one row per key) below a key equi-join, never
    * a per-customer subquery execution. The same top-k-per-key shape as
    * q_argmax_per_group, reached from SQL instead of the DataFrame API. */
  val qLateralTopk: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM g_customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM g_orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t
    ORDER BY c_custkey""")

  /** Correlated LATERAL aggregate — a multi-column correlated derived
    * table (COUNT + MAX in one subquery; the scalar-subquery form would
    * need two). Must decorrelate to one per-key aggregate LEFT OUTER
    * joined back: customers without orders keep n_orders = 0 /
    * max_price NULL (the ungrouped-aggregate-on-empty contract both
    * engines share). */
  val qLateralAgg: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT c_custkey, t.n_orders, t.max_price
    FROM g_customer,
    LATERAL (SELECT COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
             FROM g_orders WHERE o_custkey = c_custkey) t
    ORDER BY c_custkey""")

  /** TPC-H Q15 — top supplier by quarterly revenue: a CTE referenced
    * TWICE (once as the join input, once under the MAX gate). Spark
    * inlines the CTE into two aggregates — the gate side becomes a
    * one-time scalar subquery over the same filtered scan (two passes
    * over the quarter's lineitem slice, each filter-pushed; never
    * per-row). Revenue stays an exact decimal through the MAX-equality
    * comparison (double equality on aggregates would be
    * engine-dependent), cast to double only in the output. */
  val qTpchQ15: (SparkSession, String) => DataFrame = sqlQuery("""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS total_revenue
      FROM g_lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM g_supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey""")

  /** TPC-H Q20 shape — suppliers of heavily-shipped interesting parts:
    * NESTED IN chains (supplier IN an aggregated-HAVING subquery whose
    * own filter is another IN subquery). Both INs must rewrite to LEFT
    * SEMI joins — the inner one gates lineitem before its aggregate, the
    * outer one gates supplier on the HAVING survivors; nothing executes
    * per-row. */
  val qNestedIn: (SparkSession, String) => DataFrame = sqlQuery("""
    SELECT s_suppkey, s_name
    FROM g_supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM g_lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM g_part
                          WHERE p_name LIKE '%widget%')
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 2000)
    ORDER BY s_suppkey""")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_exists_semi", qExistsSemi, Some(
      "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01' AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY) GROUP BY o_orderpriority ORDER BY o_orderpriority")),
    QueryDef("q_not_exists", qNotExists, Some(
      "SELECT s_name, COUNT(*) AS numwait FROM supplier, lineitem l1, orders WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) GROUP BY s_name ORDER BY numwait DESC, s_name ASC")),
    QueryDef("q_scalar_subquery", qScalarSubquery, Some(
      "SELECT c_custkey, (SELECT MAX(o_orderkey) FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') AS latest_p_order FROM customer ORDER BY c_custkey")),
    QueryDef("q_not_in", qNotIn, Some(
      "SELECT p_brand, p_type, COUNT(*) AS cnt FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48) GROUP BY p_brand, p_type ORDER BY p_brand, p_type")),
    QueryDef("q_scalar_gate", qScalarGate, Some(
      "SELECT c_nationkey, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal FROM customer WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer WHERE c_acctbal > 0.0) AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') GROUP BY c_nationkey ORDER BY c_nationkey")),
    QueryDef("q_scalar_avg_filter", qScalarAvgFilter, Some(
      "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly FROM lineitem, part WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)")),
    QueryDef("q_lateral_topk", qLateralTopk, Some(
      "SELECT c_custkey, t.o_orderkey, t.o_totalprice FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = c_custkey ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t ORDER BY c_custkey")),
    QueryDef("q_lateral_agg", qLateralAgg, Some(
      "SELECT c_custkey, t.n_orders, t.max_price FROM customer, LATERAL (SELECT COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price FROM orders WHERE o_custkey = c_custkey) t ORDER BY c_custkey")),
    QueryDef("q_nested_in", qNestedIn, Some(
      "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%') GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 2000) ORDER BY s_suppkey")),
    QueryDef("q_tpch_q15", qTpchQ15, Some(
      "WITH revenue AS (SELECT l_suppkey AS supplier_no, SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue FROM supplier, revenue WHERE s_suppkey = supplier_no AND total_revenue = (SELECT MAX(total_revenue) FROM revenue) ORDER BY s_suppkey"))
  )
}
