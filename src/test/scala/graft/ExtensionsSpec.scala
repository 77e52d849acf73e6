package graft

/** The SQL surface: graft's native expressions registered through
  * SparkSessionExtensions must be callable from spark.sql. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .head().getDouble(0)
    assert(v === 32.0)
  }

  test("graft_intersect_count is callable from SQL") {
    val v = spark.sql(
      "SELECT graft_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L))")
      .head().getInt(0)
    assert(v === 2)
  }

  test("graft_minhash_sig and graft_simhash64 are callable from SQL") {
    val r = spark.sql(
      """SELECT size(graft_minhash_sig(transform(array('a','b'), x -> xxhash64(x)))) AS k,
        |       graft_simhash64(transform(array('a','a'), x -> xxhash64(x))) AS sh,
        |       graft_simhash64(transform(array('a'), x -> xxhash64(x))) AS sh1
        |""".stripMargin).head()
    assert(r.getAs[Int]("k") === operators.Dedup.NumHashes)
    // frequency weighting: duplicated token votes twice but the majority
    // sign per bit is unchanged → same signature as the single token
    assert(r.getAs[Long]("sh") === r.getAs[Long]("sh1"))
  }

  test("SQL and Column-API forms of the same expression agree") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotd
    import spark.implicits._
    val df = Seq((Array(1.5, -2.5), Array(3.0, 4.0))).toDF("a", "b")
    val viaCol = df.select(dotd(col("a"), col("b"))).head().getDouble(0)
    val viaSql = df.selectExpr("graft_dot(a, b)").head().getDouble(0)
    assert(viaCol === viaSql)
  }

  test("graft_orders_version TVF: SQL time travel matches the Scala " +
    "API read, and non-literal arguments are rejected") {
    val sf = "/root/testdata/sf0.001"
    val viaSql = spark.sql(
      s"SELECT count(*) FROM graft_orders_version('$sf', 2)")
      .head().getLong(0)
    val viaApi = operators.Lakehouse.readVersion(spark,
      operators.Lakehouse.versionedOrdersRoot(spark, sf), 2,
      "o_orderkey").count()
    assert(viaSql === viaApi)
    // a table identifier is planner input — non-foldable args must fail
    // analysis, not silently resolve against some row-dependent value
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_orders_version(rand()::string, 2)")
        .collect()
    }
    assert(err.getMessage.contains("literal") ||
      err.getMessage.contains("foldable"), err.getMessage.take(200))
  }
}
