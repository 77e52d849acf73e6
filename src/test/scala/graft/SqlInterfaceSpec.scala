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

  test("every Spark-SQL-compatible oracle string reproduces its builder's rows") {
    // Breadth check: the declared oracle SQL is DuckDB-dialect, but a large
    // ANSI core of it must also run through spark.sql over registered views
    // and return EXACTLY what the DataFrame builder returns — catching
    // Spark-SQL surface gaps (or silent dialect divergence) that the
    // DataFrame API hides. Dialect-incompatible strings (DuckDB list_*/
    // strftime/4-arg regexp_replace/ASOF…) fail analysis and are skipped.
    Tables.region(spark, sf).createOrReplaceTempView("region")
    Tables.nation(spark, sf).createOrReplaceTempView("nation")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    Tables.supplier(spark, sf).createOrReplaceTempView("supplier")
    Tables.part(spark, sf).createOrReplaceTempView("part")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.events(spark, sf).createOrReplaceTempView("events")
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq.map(col)
      df.select(cols: _*).collect().map(_.toString).sorted.toSeq
    }
    val outcomes = Registry.all.flatMap(q => q.oracle.map(o => (q.name, o)))
      .map { case (name, sql) =>
        val ran = scala.util.Try(render(spark.sql(sql)))
        val ok = ran.map(_ == render(SparkEntry.queries(name)(spark, sf)))
        (name, ok)
      }
    val compatible = outcomes.collect {
      case (n, scala.util.Success(m)) => (n, m)
    }
    // Known dialect divergence in strings that RUN on both engines:
    // Spark's non-ANSI string literals eat single backslashes ('\s' → 's')
    // where DuckDB keeps them, and DuckDB's 4th regexp_replace arg 'g' is
    // Spark's numeric position parameter. These four oracles are correct
    // DuckDB and runnable-but-different Spark — locked here so any NEW
    // divergence (or a fix that shrinks the set) is caught.
    // q_dedup_exact_sql and q_stream_dedup share q_dedup_exact's oracle
    // text by reference, so they inherit the same divergence.
    val knownDialectDivergent = Set("q_text_normalize",
      "q_events_extract_props", "q_doc_fingerprint", "q_dedup_exact",
      "q_dedup_exact_sql", "q_stream_dedup")
    val mismatched = compatible.collect { case (n, false) => n }
    assert(mismatched.toSet === knownDialectDivergent,
      s"spark.sql ran but diverged from the builder: ${mismatched.mkString(", ")}")
    // floor on the runnable-AND-matching ANSI core — shrinking it is a
    // surface regression
    val matching = compatible.count(_._2)
    assert(matching >= 20,
      s"only $matching oracle strings matched under spark.sql: " +
        compatible.collect { case (n, true) => n }.mkString(", "))
  }

  test("Spark-dialect twins of the dialect-divergent oracles match the builders") {
    // The four oracles locked as dialect-divergent above differ only in
    // string-literal escaping and regexp flag conventions; their
    // Spark-dialect rewrites must reproduce the builders exactly — so the
    // full oracled surface IS expressible in spark.sql, just not always in
    // the identical byte string.
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Tables.events(spark, sf).createOrReplaceTempView("events")
    val twins = Map(
      "q_text_normalize" ->
        """SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')) AS norm FROM documents ORDER BY doc_id""",
      "q_doc_fingerprint" ->
        """SELECT doc_id, md5(to_binary(lower(regexp_replace(text, '\\s+', ' ')), 'utf-8')) AS fp FROM documents ORDER BY doc_id""",
      "q_dedup_exact" ->
        """SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, row_number() OVER (PARTITION BY md5(to_binary(lower(regexp_replace(text, '\\s+', ' ')), 'utf-8')) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 ORDER BY doc_id""",
      "q_events_extract_props" ->
        """SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k FROM events ORDER BY event_id""")
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq.map(col)
      df.select(cols: _*).collect().map(_.toString).sorted.toSeq
    }
    twins.foreach { case (name, sql) =>
      assert(render(spark.sql(sql)) ===
        render(SparkEntry.queries(name)(spark, sf)), name)
    }
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
