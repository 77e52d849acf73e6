package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Plan locks for the transparent materialized-view rewrite
  * (plans.MvRewriteRule): the declared fact-table query must execute
  * against the ROLLUP (never lineitem), the rewrite must be
  * row-identical to the rule-free plan, and the safety bails must hold —
  * a filtered aggregate, a different grouping, and an unregistered
  * session all keep the fact scan. */
class MvRewriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] = {
    df.collect()
    collectFileScans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).toSet
  }

  test("the registered monthly aggregate executes against the rollup, " +
    "never the fact table, with identical rows") {
    val viaRule = SparkEntry.queries("q_rollup_rewrite")(spark, sf)
    val scanned = scannedFiles(viaRule)
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_rollup_")),
      s"rewrite did not swap the scan: $scanned")
    assert(!scanned.exists(_.contains("lineitem")),
      "rewritten plan still scans the fact table")
    // row-identical to the direct fact computation with the MV
    // unregistered (the rule-free plan)
    try {
      MvRewrite.unregister(spark)
      val direct = MvRewrite.monthlyOverFact(Tables.lineitem(spark, sf))
        .orderBy("month", "l_returnflag")
      val directScan = scannedFiles(direct)
      assert(directScan.exists(_.contains("lineitem")),
        "control plan unexpectedly avoided the fact table")
      assert(viaRule.collect().toSeq === direct.collect().toSeq)
    } finally {
      // restore for any later key in this shared session
      SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect(): Unit
    }
  }

  test("derivability lattice: coarser groupings and the global pair " +
    "re-aggregate from the rollup") {
    for (key <- Seq("q_rollup_rewrite_coarse", "q_rollup_rewrite_global")) {
      val df = SparkEntry.queries(key)(spark, sf)
      val scanned = scannedFiles(df)
      assert(scanned.nonEmpty && scanned.forall(_.contains("graft_rollup_")),
        s"$key did not swap the scan: $scanned")
    }
    // the raw-double sum shape (no exact-decimal cast) is NOT the
    // view's aggregate — it must keep the fact scan even though it
    // groups by a view dimension
    SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect() // register
    val raw = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    assert(scannedFiles(raw).exists(_.contains("lineitem")),
      "a raw-double aggregate was wrongly answered from the rollup")
  }

  test("the MV binds to its fact-table INSTANCE: a different scale " +
    "factor's lineitem is never answered from the registered rollup") {
    // register against sf0.001, then aggregate sf0.01's lineitem — the
    // exact failure the full suite caught when the marker was the bare
    // table name: count() over one SF answered from the OTHER SF's
    // rollup (60000 read back as 6000)
    SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect() // register
    val other = "/root/testdata/sf0.01"
    val n = Tables.lineitem(spark, other).count()
    assert(n === 60000L, s"cross-instance rewrite corrupted count: $n")
    val df = MvRewrite.monthlyOverFact(Tables.lineitem(spark, other))
    assert(scannedFiles(df).exists(_.contains("sf0.01/lineitem")),
      "the other instance's aggregate left its own fact table")
  }

  test("filtered lattice: dimension predicates move to the rollup, and " +
    "a filtered-to-empty global count stays 0, never NULL") {
    val viaRule = SparkEntry.queries("q_rollup_rewrite_filtered")(spark, sf)
    val scanned = scannedFiles(viaRule)
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_rollup_")),
      s"filtered rewrite did not swap the scan: $scanned")
    // row-identical to the rule-free filtered fact computation
    val got = viaRule.collect().toSeq
    try {
      MvRewrite.unregister(spark)
      val month = date_format(to_date(col("l_shipdate")), "yyyy-MM")
      val direct = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === "R" && month >= "1994-01")
        .groupBy(month.as("month"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy("month")
      assert(scannedFiles(direct).exists(_.contains("lineitem")))
      assert(got === direct.collect().toSeq)
    } finally {
      SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect(): Unit
    }
    // count semantics on an empty rewrite input: an impossible
    // dimension predicate leaves ZERO rollup rows, and the global
    // count must still come back 0 (the coalesce) — exactly what the
    // unfiltered fact count would return over zero matching rows
    val month = date_format(to_date(col("l_shipdate")), "yyyy-MM")
    val empty = Tables.lineitem(spark, sf)
      .filter(month >= "2999-01")
      .agg(count(lit(1)).as("n_items"))
    assert(scannedFiles(empty).forall(_.contains("graft_rollup_")),
      "impossible-dimension filter did not rewrite")
    val r = empty.collect()
    assert(r.length === 1 && !r.head.isNullAt(0) && r.head.getLong(0) === 0L,
      s"empty-input count(*) must be 0, got ${r.toSeq}")
  }

  test("pure-SQL candidates rewrite too: the parsed text's folded " +
    "expressions match the template and the plan scans the rollup") {
    val df = SparkEntry.queries("q_rollup_rewrite_sql")(spark, sf)
    val scanned = scannedFiles(df)
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_rollup_")),
      s"SQL-text rewrite did not swap the scan: $scanned")
    assert(df.collect().toSeq ===
      SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect().toSeq)
  }

  test("multi-view catalog: each fact's aggregate is answered from ITS " +
    "OWN rollup with both views registered") {
    val ordersVia = SparkEntry.queries("q_rollup_rewrite_orders")(spark, sf)
    val ordersScan = scannedFiles(ordersVia)
    assert(ordersScan.nonEmpty &&
      ordersScan.forall(_.contains("graft_orollup_")),
      s"orders aggregate not answered from the orders rollup: $ordersScan")
    // the lineitem view is still live in the same session and still
    // binds to ITS rollup — catalog entries cannot shadow each other
    val liVia = MvRewrite.monthlyOverFact(Tables.lineitem(spark, sf))
    val liScan = scannedFiles(liVia)
    assert(liScan.nonEmpty && liScan.forall(_.contains("graft_rollup_")),
      s"lineitem aggregate lost its rollup after a second registration: " +
        liScan)
    // row identity for the orders rewrite vs the rule-free plan
    val got = ordersVia.collect().toSeq
    try {
      MvRewrite.unregister(spark)
      val direct = graft.operators.Olap2.OrdersMonthlyView
        .overFact(Tables.orders(spark, sf))
        .orderBy("month", "o_orderpriority")
      assert(scannedFiles(direct).exists(_.contains("orders")))
      assert(got === direct.collect().toSeq)
    } finally {
      SparkEntry.queries("q_rollup_rewrite_orders")(spark, sf)
        .collect(): Unit
    }
  }

  test("HAVING composes: the filter above the aggregate survives the " +
    "swap and the plan scans the rollup") {
    val df = SparkEntry.queries("q_rollup_rewrite_having")(spark, sf)
    val scanned = scannedFiles(df)
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_rollup_")),
      s"HAVING rewrite did not swap the scan: $scanned")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(
      _.getLong(df.columns.indexOf("n_items")) >= 25))
  }

  test("fact binding is path-boundary exact: a sibling table sharing " +
    "the marker prefix is never answered from the rollup") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mv_boundary").toString
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // same schema, DIFFERENT content — a prefix-substring match would
    // silently answer this table's aggregate from the other's rollup
    li.limit(500).write.mode("overwrite")
      .parquet(s"$tmp/lineitem_sample.parquet")
    try {
      MvRewrite.register(spark, s"$tmp/lineitem",
        graft.operators.Olap2.dailyRollupPath(spark, sf))
      val agg = MvRewrite.monthlyOverFact(
        spark.read.parquet(s"$tmp/lineitem_sample.parquet"))
      assert(scannedFiles(agg).exists(_.contains("lineitem_sample")),
        "sibling-prefix table was wrongly bound to the registered MV")
      assert(agg.agg(sum(col("n_items"))).head().getLong(0) === 500L)
      // while the exact-boundary table DOES rewrite
      val bound = MvRewrite.monthlyOverFact(
        spark.read.parquet(s"$tmp/lineitem.parquet"))
      assert(scannedFiles(bound).forall(_.contains("graft_rollup_")),
        "the exact-marker table failed to rewrite")
    } finally {
      SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect(): Unit
    }
  }

  test("safety bails: filters, different groupings, and near-miss " +
    "aggregates keep the fact scan") {
    SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect() // register
    val li = Tables.lineitem(spark, sf)
    // a filter on a MEASURE must never be answered from the summary
    // (dimension predicates rewrite; l_quantity is a measure)
    val filtered = MvRewrite.monthlyOverFact(
      li.filter(col("l_quantity") > 10))
    assert(scannedFiles(filtered).exists(_.contains("lineitem")))
    // an extra grouping column is not derivable
    val extraGroup = li.groupBy(
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"))
    assert(scannedFiles(extraGroup).exists(_.contains("lineitem")))
    // same shape, different aggregate semantics (sum of RAW double vs
    // the view's exact-decimal sum) — semantic equality must refuse it
    val nearMiss = li.groupBy(
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_items"),
        max(col("l_discount")).as("x"),
        min(col("l_discount")).as("y"))
    assert(scannedFiles(nearMiss).exists(_.contains("lineitem")))
  }

  test("star-schema view: the fact-join-dim aggregate executes against " +
    "the join rollup — neither base table scanned — with identical rows") {
    val viaRule = SparkEntry.queries("q_rollup_rewrite_join")(spark, sf)
    val scanned = scannedFiles(viaRule)
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_srollup_")),
      s"star rewrite did not swap the scan: $scanned")
    assert(!scanned.exists(f =>
      f.contains("lineitem") || f.contains("orders")),
      "rewritten star plan still scans a base table")
    try {
      MvRewrite.unregister(spark)
      val direct = operators.Olap2.starOverFact(
        operators.Olap2.starJoin(spark, sf))
        .orderBy("month", "o_orderpriority", "l_returnflag")
      assert(scannedFiles(direct).exists(_.contains("lineitem")),
        "control star plan unexpectedly avoided the fact table")
      assert(viaRule.collect().toSeq === direct.collect().toSeq)
    } finally {
      SparkEntry.queries("q_rollup_rewrite_join")(spark, sf).collect(): Unit
    }
    // the lattice carries over joins: a grouping subset of the star
    // view's dimensions re-aggregates from the same rollup
    val coarse = operators.Olap2.starJoin(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)"))
        .cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
    val cScanned = scannedFiles(coarse)
    assert(cScanned.nonEmpty && cScanned.forall(_.contains("graft_srollup_")),
      s"star lattice subset kept the base scan: $cScanned")
  }

  test("star-schema near-misses keep the fact scan: a different join " +
    "key, an extra join conjunct, and a filtered join side are not " +
    "the registered view") {
    SparkEntry.queries("q_rollup_rewrite_join")(spark, sf)
      .collect() // register
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
    // same groupings/aggregates, WRONG join key — a different query
    val wrongKey = operators.Olap2.starOverFact(
      li.join(ord, col("l_partkey") === col("o_orderkey")))
    assert(scannedFiles(wrongKey).exists(_.contains("lineitem")),
      "a different join key was wrongly answered from the join rollup")
    // an extra conjunct narrows the join: not the view
    val extraConj = operators.Olap2.starOverFact(
      li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate")))
    assert(scannedFiles(extraConj).exists(_.contains("lineitem")),
      "an extra join conjunct was wrongly answered from the join rollup")
    // a filter on a join side (non-view column) changes the row set
    val filteredSide = operators.Olap2.starOverFact(
      li.join(ord.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey")))
    assert(scannedFiles(filteredSide).exists(_.contains("lineitem")),
      "a filtered join side was wrongly answered from the join rollup")
    // and the single-table view still swaps in the same session (the
    // catalog keeps BOTH views under the lineitem marker now)
    SparkEntry.queries("q_rollup_rewrite")(spark, sf).collect(): Unit
    val mono = MvRewrite.monthlyOverFact(li)
    val mScanned = scannedFiles(mono)
    assert(mScanned.nonEmpty && mScanned.forall(_.contains("graft_rollup_")),
      s"single-table view lost its swap beside the star view: $mScanned")
  }

  test("streamed MV with staleness gate: fresh head swaps to the delta " +
    "store, an un-maintained commit falls back to the fact scan, and " +
    "maintenance re-arms the rewrite") {
    import graft.streaming.EventsStreaming
    import graft.operators.Lakehouse
    // FRESH: the declared key's plan reads the _mv delta store, never
    // the table's data files
    val viaRule = SparkEntry.queries("q_rollup_rewrite_streamed")(spark, sf)
    val scanned = scannedFiles(viaRule)
    assert(scanned.nonEmpty && scanned.forall(_.contains("/_mv/")),
      s"streamed rewrite did not swap to the delta store: $scanned")
    val arc = EventsStreaming.mvArcRoot(spark, sf)
    def headDataFiles(root: String): Seq[String] =
      Lakehouse.manifestEntries(spark, root,
        Lakehouse.latestVersion(spark, root))
        .collect { case ("data", p, _) => s"$root/$p" }
    def candidate(root: String) =
      EventsStreaming.streamedMvOverFact(
        spark.read.parquet(headDataFiles(root): _*)).orderBy("o_custkey")
    // STALE: clone the arc, append one commit WITHOUT maintaining the
    // view — the gate sees maintained-through < head and keeps the
    // fact scan, whose rows must equal the rule-free control
    val stale = arc + "_stale"
    Lakehouse.hardLinkTree(arc, stale,
      Seq("_snapshots", "_manifests", "data", "deletes", "_mv"))
    try {
      val h0 = Lakehouse.latestVersion(spark, stale)
      spark.range(1, 4)
        .select((col("id") + 90000000L).as("o_orderkey"),
          lit(424242L).as("o_custkey"),
          lit(java.sql.Date.valueOf("1996-01-01")).as("o_orderdate"),
          lit(10.0).as("o_totalprice"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$stale/data/w=append")
      Lakehouse.publishVersion(spark, stale, h0 + 1,
        Lakehouse.snapshotManifests(spark, stale, h0),
        Lakehouse.listDataFiles(spark, stale, s"$stale/data/w=append")
          .map(("data", _, h0 + 1)))
      MvRewrite.registerView(spark, stale, s"$stale/_mv",
        EventsStreaming.streamedMvViewDef(stale))
      val fallback = candidate(stale)
      val fScanned = scannedFiles(fallback)
      assert(fScanned.exists(_.contains("/data/")) &&
        !fScanned.exists(_.contains("/_mv/")),
        s"stale view was wrongly served: $fScanned")
      assert(fallback.filter(col("o_custkey") === 424242L).count() === 1L)
      // MAINTAIN the missing epoch from its CDC slice: the gate re-arms
      // and the same candidate now serves from the delta store, rows
      // identical to the fact scan (appended customer included)
      EventsStreaming.maintainMvEpoch(spark, stale, h0 + 1)
      val served = candidate(stale)
      val sScanned = scannedFiles(served)
      assert(sScanned.nonEmpty && sScanned.forall(_.contains("/_mv/")),
        s"re-armed view did not swap: $sScanned")
      assert(served.collect().toSeq === fallback.collect().toSeq)
    } finally {
      val p = new org.apache.hadoop.fs.Path(stale)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
    // DATA-ONLY guard: a maintained-through-head table whose head holds
    // an outstanding merge-on-read delete must NOT rewrite — the bare
    // file scan the rule matches is not the live view there
    val mor = arc + "_mor"
    Lakehouse.hardLinkTree(arc, mor,
      Seq("_snapshots", "_manifests", "data", "deletes", "_mv"))
    try {
      val h0 = Lakehouse.latestVersion(spark, mor)
      val v1 = Lakehouse.deleteCommit(spark, mor, h0,
        Lakehouse.readVersion(spark, mor, h0, "o_orderkey")
          .filter(pmod(col("o_orderkey"), lit(10)) === 7)
          .select("o_orderkey"))
      EventsStreaming.maintainMvEpoch(spark, mor, v1)
      MvRewrite.registerView(spark, mor, s"$mor/_mv",
        EventsStreaming.streamedMvViewDef(mor))
      val bare = candidate(mor)
      assert(!scannedFiles(bare).exists(_.contains("/_mv/")),
        "merge-on-read head was wrongly answered from the view")
    } finally {
      val p = new org.apache.hadoop.fs.Path(mor)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
  }
}
