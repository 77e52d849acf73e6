package graft

import org.apache.spark.sql.functions._

/** The engine's tables + functions compose under spark.sql too: register
  * the testdata as temp views and run ANSI SQL — same Catalyst plans as
  * the DataFrame builders, so results must agree exactly. */
class SqlInterfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views equals the DataFrame builder") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    Tables.customer(spark, sf).createOrReplaceTempView("customer_v")
    val viaSql = spark.sql(
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin).collect()
    val viaDf = operators.Relational.qJoinEquiInner(spark, sf).collect()
    assert(viaSql.length === viaDf.length)
    viaSql.zip(viaDf).foreach { case (a, b) => assert(a === b) }
  }

  test("graft SQL functions compose with views in one statement") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val n = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT doc_id,
        |         graft_simhash64(transform(split(trim(text), '\\s+'),
        |                                   t -> xxhash64(t))) AS sh
        |  FROM docs_v) WHERE sh IS NOT NULL""".stripMargin)
      .head().getLong(0)
    assert(n === Tables.documents(spark, sf).count())
  }
}
