package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, Tables}

/** SQL-text twins of flagship DataFrame queries — the same logical plans
  * declared through the `spark.sql` front door (temp views + SQL text),
  * SHARING the DataFrame queries' DuckDB oracles by reference, so the
  * SQL entry path is itself CORRECTNESS-gated rather than only
  * spec-asserted (SqlInterfaceSpec checks plan equality; these rows make
  * the driver hash-verify SQL-path results end to end). No new plan
  * shapes: Catalyst analyzes both entries to the same optimized plan.
  *
  * View names are derived from the data DIRECTORY (`g7_<dirhash>_<t>`),
  * not a fixed prefix: temp views are session-global, so two twins built
  * concurrently on one shared session (the sbt shared-session test
  * setup) with a fixed name could race between registration and
  * `spark.sql` analysis and bind one query to the other's directory
  * (ADVICE r7). With dir-keyed names, concurrent builds over the SAME
  * directory register identical frames (a benign overwrite) and builds
  * over different directories cannot collide at all. */
object SqlTwins {

  private def sql(tables: Seq[String], text: String)
      : (SparkSession, String) => DataFrame = (s, d) => {
    val suffix =
      java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3
        .stringHash(d))
    tables.foreach(t =>
      Tables.table(s, d, t).createOrReplaceTempView(s"g7_${suffix}_$t"))
    s.sql(text.replace("g7_", s"g7_${suffix}_"))
  }

  private def oracleOf(defs: Seq[QueryDef], name: String): Option[String] =
    defs.find(_.name == name).flatMap(_.oracle)

  private val disc = "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_tpch_q1_sql",
      sql(Seq("lineitem"),
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM($disc) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM($disc * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           |  COUNT(*) AS count_order,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc
           |FROM g7_lineitem
           |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      oracleOf(Olap.defs, "q_tpch_q1")),
    QueryDef("q_tpch_q5_sql",
      sql(Seq("customer", "orders", "lineitem", "supplier", "nation",
          "region"),
        s"""SELECT n_name, CAST(SUM($disc) AS DOUBLE) AS revenue
           |FROM g7_customer
           |JOIN g7_orders ON c_custkey = o_custkey
           |JOIN g7_lineitem ON l_orderkey = o_orderkey
           |JOIN g7_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN g7_nation ON s_nationkey = n_nationkey
           |JOIN g7_region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY revenue DESC, n_name ASC""".stripMargin),
      oracleOf(Olap.defs, "q_tpch_q5")),
    QueryDef("q_argmax_per_group_sql",
      sql(Seq("orders"),
        """SELECT o_custkey, o_orderkey,
          |  date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate_s,
          |  o_totalprice
          |FROM (SELECT *, row_number() OVER
          |        (PARTITION BY o_custkey
          |         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |      FROM g7_orders)
          |WHERE rn = 1
          |ORDER BY o_custkey""".stripMargin),
      oracleOf(Relational.defs, "q_argmax_per_group")),
    QueryDef("q_window_running_sum_sql",
      sql(Seq("orders"),
        """SELECT o_orderkey, o_custkey,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          |    (PARTITION BY o_custkey
          |     ORDER BY o_orderdate ASC, o_orderkey ASC
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS DOUBLE) AS running
          |FROM g7_orders
          |ORDER BY o_orderkey""".stripMargin),
      oracleOf(Relational.defs, "q_window_running_sum")),
    QueryDef("q_dedup_exact_sql",
      sql(Seq("documents"),
        """SELECT doc_id, n_chars
          |FROM (SELECT doc_id, n_chars, row_number() OVER
          |        (PARTITION BY md5(to_binary(
          |           lower(regexp_replace(text, '\\s+', ' ')), 'utf-8'))
          |         ORDER BY doc_id) AS rn
          |      FROM g7_documents)
          |WHERE rn = 1
          |ORDER BY doc_id""".stripMargin),
      oracleOf(Dedup.defs, "q_dedup_exact")),
    // The TEXTBOOK correlated formulations of Q21/Q2 through spark.sql —
    // unlike the other twins these are NOT the same logical plan as their
    // DataFrame originals: the originals are hand-written decorrelations
    // (one-pass aggregate / window-min), while these make CATALYST do the
    // decorrelating from the classic EXISTS/NOT-EXISTS and correlated-MIN
    // text. Sharing the originals' oracles hash-proves all three agree:
    // classic SQL ≡ Catalyst's rewrite ≡ the hand rewrite.
    QueryDef("q_tpch_q21_sql",
      sql(Seq("lineitem", "orders", "supplier", "nation", "region"),
        """SELECT s_name, COUNT(*) AS numwait
          |FROM (
          |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          |  FROM g7_lineitem l1
          |  JOIN g7_orders ON o_orderkey = l1.l_orderkey
          |  WHERE o_orderstatus = 'F'
          |    AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          |    AND EXISTS (SELECT 1 FROM g7_lineitem l2
          |                WHERE l2.l_orderkey = l1.l_orderkey
          |                  AND l2.l_suppkey <> l1.l_suppkey)
          |    AND NOT EXISTS (SELECT 1 FROM g7_lineitem l3
          |                WHERE l3.l_orderkey = l1.l_orderkey
          |                  AND l3.l_suppkey <> l1.l_suppkey
          |                  AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
          |) w
          |JOIN g7_supplier ON s_suppkey = l_suppkey
          |JOIN g7_nation ON s_nationkey = n_nationkey
          |JOIN g7_region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin),
      oracleOf(Olap2.defs, "q_tpch_q21")),
    QueryDef("q_tpch_q2_sql",
      sql(Seq("lineitem", "part", "supplier", "nation", "region"),
        """WITH supply AS (
          |  SELECT l_partkey, s_suppkey, s_acctbal, s_name, n_name,
          |         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
          |  FROM g7_lineitem
          |  JOIN g7_supplier ON l_suppkey = s_suppkey
          |  JOIN g7_nation ON s_nationkey = n_nationkey
          |  JOIN g7_region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'EUROPE'
          |  GROUP BY 1, 2, 3, 4, 5)
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
          |       CAST(cost AS DOUBLE) AS supply_cost
          |FROM supply JOIN g7_part ON p_partkey = l_partkey
          |WHERE p_size <= 10 AND p_type = 'STANDARD'
          |  AND cost = (SELECT MIN(s2.cost) FROM supply s2
          |              WHERE s2.l_partkey = supply.l_partkey)
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          |LIMIT 100""".stripMargin),
      oracleOf(Olap2.defs, "q_tpch_q2"))
  )
}
