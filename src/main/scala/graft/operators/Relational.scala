package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Relational operator inventory (SURVEY.md §2.2–§2.8), re-expressed over
  * the driver test tables with the FIXTURES.md §C domain mapping
  * (plans→part, user_subscriptions→orders, users→customer).
  *
  * Reference semantics re-expressed here (citations into /root/reference):
  *  - projections `dags/subscription_flow.py:84-91,126-134`
  *  - conjunctive active-filter `:95-98`, enum validation `:62-63`
  *  - first-match lookup `:121,177,207`
  *  - FK→dim join `:118-121`, string-key lookup `:177,207`
  *  - existence / absence gates `:99-100,108-109` (semi / anti join)
  *  - update-by-key overlay `:228-242`
  *  - id allocation max+1 `:214`, latest-active argmax `:93-103`
  *  - append `:224-225`, CASE Paid/Free `:222`, coalesce chains `:202-205`
  *  - price delta `:181`, casts `:59,97,123,124`
  *
  * Scale notes: every plan here is a declarative DataFrame plan — filters
  * and projections reach the parquet scan (PushedFilters / ReadSchema),
  * dimension joins are broadcast (no shuffle of the fact side), argmax /
  * overlay use a single hash-partitioned window shuffle on the group key,
  * and top-k sorts plan as TakeOrderedAndProject (no full sort).
  */
object Relational {

  /** Exact money arithmetic: DECIMAL(18,2) then a final DOUBLE cast is
    * bit-identical between Spark and DuckDB (values << 2^53), and decimal
    * summation is order-independent — safe under any shuffle layout. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private def nullif(c: Column, v: String): Column =
    when(c === v, lit(null)).otherwise(c)

  // P1 — column-subset projection (ref :84-87)
  val qProjectSubset: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.part(s, d)
      .select(col("p_name"), col("p_partkey"))
      .orderBy("p_partkey")

  // P2/C4 — computed string projection "name - $price" (ref :88-91).
  // printf-style %.2f renders identically in Spark and DuckDB, avoiding
  // the int-vs-double rendering trap (SURVEY §7 trap 2).
  val qProjectConcat: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        format_string("%s - $%.2f", col("p_name"), col("p_retailprice"))
          .as("display"))
      .orderBy("p_partkey")

  // P2 reference-faithful variant: the reference renders its JSON-int
  // prices with Python str() — `Pro - $29`, no decimals
  // (dags/subscription_flow.py:88-91). Integral prices render as bare
  // ints; non-integral keep the %.2f money form. A user diffing display
  // strings against the reference sees identical text.
  val qProjectConcatInt: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        when(col("p_retailprice") === floor(col("p_retailprice")),
          format_string("%s - $%d", col("p_name"),
            col("p_retailprice").cast("long")))
          .otherwise(format_string("%s - $%.2f", col("p_name"),
            col("p_retailprice")))
          .as("display"))
      .orderBy("p_partkey")

  // F1/F3 — conjunctive equality filter with cast-normalized key (ref :95-98)
  val qFilterEqAnd: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .filter(
        coalesce(col("o_custkey").cast("long"), lit(0L)) === lit(7L) &&
          col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  // F2 — set-membership predicate (ref :62-63)
  val qFilterIsin: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")

  // F4/O1 — deterministic first-match lookup (ref :121,177,207):
  // filter + orderBy + limit 1 plans as TakeOrderedAndProject.
  val qLookupFirst: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_size") === 5)
      .select("p_partkey", "p_name", "p_size")
      .orderBy("p_partkey")
      .limit(1)

  // J1 — equi inner join fact→dim, broadcast the dim (ref :118-121)
  val qJoinEquiInner: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  // J2 — join on a string key (ref :177,207): part ⋈ per-brand aggregate
  val qJoinStringKey: (SparkSession, String) => DataFrame = (s, d) => {
    val p = Tables.part(s, d)
    val byBrand = p.groupBy("p_brand").agg(count(lit(1)).as("brand_cnt"))
    p.join(broadcast(byBrand), "p_brand")
      .select("p_partkey", "p_brand", "brand_cnt")
      .orderBy("p_partkey")
  }

  // J3 — left semi: customers having an open order (ref :99-100)
  val qJoinSemi: (SparkSession, String) => DataFrame = (s, d) => {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
    Tables.customer(s, d)
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // J4 — left anti: customers with no in-progress order (ref :108-109
  // error arm — "no active subscription")
  val qJoinAnti: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // J6 — update-by-key as join + when/otherwise overlay (ref :228-242):
  // "cancel" the latest order of every customer. Target keys come from a
  // window argmax; the overlay is a left join + CASE — the Spark shape of
  // an in-place row update (no mutable store).
  val qUpdateOverlay: (SparkSession, String) => DataFrame = (s, d) => {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val targets = o
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey").as("t_orderkey"))
    o.join(targets, col("o_orderkey") === col("t_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        when(col("t_orderkey").isNotNull, lit("CANCELLED"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus_new"))
      .orderBy("o_orderkey")
  }

  // A1 — global max with default-on-empty + increment (ref :214)
  val qAggMaxDefault: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .agg((coalesce(max(col("o_orderkey")), lit(1000L)) + 1L).as("next_id"))

  // A2/W1 — argmax per group with deterministic tie-break (ref :93-103):
  // latest order per customer. The flagship query.
  val qArgmaxPerGroup: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_totalprice"))
      .orderBy("o_custkey")
  }

  // A3 — group count (ref :99-100 non-empty gate)
  val qGroupbyCount: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_custkey")

  // Extension agg — partial+final hash aggregate over the big fact
  // (TPC-H Q1 shape). Decimal sums → exact, order-independent.
  val qAggGroupbySum: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("cnt"))
      .withColumn("avg_qty", col("sum_qty") / col("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  // W1 — ranking window (ref :102)
  val qWindowRownum: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"))
      .orderBy("o_orderkey")
  }

  // Extension window — running sum per customer (frame rowsBetween)
  val qWindowRunningSum: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running"))
      .orderBy("o_orderkey")
  }

  // O1 — top-1 by measure (ref :102): TakeOrderedAndProject, no full sort
  val qSortLimitTop1: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(1)

  // Extension — multi-key top-k
  val qSortMultikey: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
        col("o_orderkey").asc)
      .limit(100)

  // E1/A1/C7 — append one constructed row with an allocated id (ref :214-225)
  val qUnionAppend: (SparkSession, String) => DataFrame = (s, d) => {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey",
      "o_orderstatus")
    val newRow = Tables.orders(s, d)
      .agg((coalesce(max(col("o_orderkey")), lit(1000L)) + 1L)
        .as("o_orderkey"))
      .select(col("o_orderkey"), lit(101L).as("o_custkey"),
        lit("NEW").as("o_orderstatus"))
    o.unionByName(newRow).orderBy("o_orderkey")
  }

  // C1 — CASE WHEN payment classification (ref :222)
  val qCaseWhen: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 100000d, lit("HIGH"))
          .when(col("o_totalprice") > 0d, lit("PAID"))
          .otherwise(lit("FREE")).as("payment_status"))
      .orderBy("o_orderkey")

  // C2 — coalesce / default chain with ordered precedence (ref :202-205)
  val qCoalesceChain: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        coalesce(
          nullif(col("o_orderstatus"), "O"),
          nullif(col("o_orderpriority"), "1-URGENT"),
          lit("fallback")).as("resolved"))
      .orderBy("o_orderkey")

  // C3 — arithmetic price delta between two looked-up rows (ref :181)
  val qPriceDiff: (SparkSession, String) => DataFrame = (s, d) => {
    val p = Tables.part(s, d)
    val cur = p.filter(col("p_partkey") === 1L)
      .select(col("p_partkey").as("cur_key"),
        col("p_retailprice").as("cur_price"))
    val chosen = p.filter(col("p_partkey") === 2L)
      .select(col("p_partkey").as("new_key"),
        col("p_retailprice").as("new_price"))
    cur.crossJoin(chosen)
      .select(col("cur_key"), col("new_key"),
        (dec(col("new_price")) - dec(col("cur_price")))
          .cast("double").as("price_diff"))
  }

  // C6 — explicit casts (ref §1.2). floor() both sides: Spark CAST
  // double→long truncates while DuckDB rounds, so the comparable form
  // is floor.
  val qCastTypes: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("id_str"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        dec(col("o_totalprice")).cast("string").as("price_str"),
        col("o_custkey").cast("double").as("cust_d"))
      .orderBy("o_orderkey")

  // C8/S5 — result-to-JSON notify payload (ref :248-256). No oracle:
  // JSON text layout is engine-specific (driver records rows-only).
  val qResultTojson: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"))).as("payload"))
      .orderBy("o_orderkey")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_project_subset", qProjectSubset, Some(
      "SELECT p_name, p_partkey FROM part ORDER BY p_partkey")),
    QueryDef("q_project_concat", qProjectConcat, Some(
      "SELECT p_partkey, printf('%s - $%.2f', p_name, p_retailprice) AS display FROM part ORDER BY p_partkey")),
    QueryDef("q_project_concat_int", qProjectConcatInt, Some(
      "SELECT p_partkey, CASE WHEN p_retailprice = floor(p_retailprice) THEN printf('%s - $%d', p_name, CAST(p_retailprice AS BIGINT)) ELSE printf('%s - $%.2f', p_name, p_retailprice) END AS display FROM part ORDER BY p_partkey")),
    QueryDef("q_filter_eq_and", qFilterEqAnd, Some(
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE COALESCE(CAST(o_custkey AS BIGINT), 0) = 7 AND o_orderstatus = 'O' ORDER BY o_orderkey")),
    QueryDef("q_filter_isin", qFilterIsin, Some(
      "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus IN ('O','F') ORDER BY o_orderkey")),
    QueryDef("q_lookup_first", qLookupFirst, Some(
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size = 5 ORDER BY p_partkey LIMIT 1")),
    QueryDef("q_join_equi_inner", qJoinEquiInner, Some(
      "SELECT o_orderkey, o_custkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),
    QueryDef("q_join_string_key", qJoinStringKey, Some(
      "SELECT p_partkey, p_brand, brand_cnt FROM part JOIN (SELECT p_brand, COUNT(*) AS brand_cnt FROM part GROUP BY p_brand) b USING (p_brand) ORDER BY p_partkey")),
    QueryDef("q_join_semi", qJoinSemi, Some(
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') ORDER BY c_custkey")),
    QueryDef("q_join_anti", qJoinAnti, Some(
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY c_custkey")),
    QueryDef("q_update_overlay", qUpdateOverlay, Some(
      "SELECT o_orderkey, o_custkey, CASE WHEN rn = 1 THEN 'CANCELLED' ELSE o_orderstatus END AS o_orderstatus_new FROM (SELECT o_orderkey, o_custkey, o_orderstatus, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) ORDER BY o_orderkey")),
    QueryDef("q_agg_max_default", qAggMaxDefault, Some(
      "SELECT COALESCE(MAX(o_orderkey), 1000) + 1 AS next_id FROM orders")),
    QueryDef("q_argmax_per_group", qArgmaxPerGroup, Some(
      "SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_totalprice FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1 ORDER BY o_custkey")),
    QueryDef("q_groupby_count", qGroupbyCount, Some(
      "SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey ORDER BY o_custkey")),
    QueryDef("q_agg_groupby_sum", qAggGroupbySum, Some(
      "SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),
    QueryDef("q_window_rownum", qWindowRownum, Some(
      "SELECT o_orderkey, o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders ORDER BY o_orderkey")),
    QueryDef("q_window_running_sum", qWindowRunningSum, Some(
      "SELECT o_orderkey, o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running FROM orders ORDER BY o_orderkey")),
    QueryDef("q_sort_limit_top1", qSortLimitTop1, Some(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1")),
    QueryDef("q_sort_multikey", qSortMultikey, Some(
      "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC LIMIT 100")),
    QueryDef("q_union_append", qUnionAppend, Some(
      "SELECT * FROM (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders UNION ALL SELECT (SELECT COALESCE(MAX(o_orderkey), 1000) + 1 FROM orders) AS o_orderkey, CAST(101 AS BIGINT) AS o_custkey, 'NEW' AS o_orderstatus) ORDER BY o_orderkey")),
    QueryDef("q_case_when", qCaseWhen, Some(
      "SELECT o_orderkey, CASE WHEN o_totalprice > 100000 THEN 'HIGH' WHEN o_totalprice > 0 THEN 'PAID' ELSE 'FREE' END AS payment_status FROM orders ORDER BY o_orderkey")),
    QueryDef("q_coalesce_chain", qCoalesceChain, Some(
      "SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus, 'O'), NULLIF(o_orderpriority, '1-URGENT'), 'fallback') AS resolved FROM orders ORDER BY o_orderkey")),
    QueryDef("q_price_diff", qPriceDiff, Some(
      "SELECT a.p_partkey AS cur_key, b.p_partkey AS new_key, CAST(CAST(b.p_retailprice AS DECIMAL(18,2)) - CAST(a.p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price_diff FROM part a CROSS JOIN part b WHERE a.p_partkey = 1 AND b.p_partkey = 2")),
    QueryDef("q_cast_types", qCastTypes, Some(
      "SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS id_str, CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str, CAST(o_custkey AS DOUBLE) AS cust_d FROM orders ORDER BY o_orderkey")),
    QueryDef("q_result_tojson", qResultTojson, None)
  )
}
