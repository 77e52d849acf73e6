package graft

import org.apache.spark.sql.functions._

/** Locks in the physical-plan properties the 100 TB design depends on —
  * a regression guard against plan drift (e.g. a lost broadcast hint or a
  * filter that stops reaching the scan). */
class PlanRegressionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dim join broadcasts the dimension (no fact shuffle)") {
    val p = plan("q_join_equi_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("top-1 plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_limit_top1")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("filters are pushed to the parquet scan") {
    val p = plan("q_filter_eq_and")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("EqualTo(o_orderstatus,O)"), p.take(800))
  }

  test("scans are column-pruned to the projected schema") {
    val p = plan("q_project_subset")
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("p_name") && readSchema.contains("p_partkey"),
      readSchema)
    // the unprojected columns must NOT be read
    assert(!readSchema.contains("p_retailprice") &&
      !readSchema.contains("p_brand"), readSchema)
  }

  test("grouped aggregation runs partial then final") {
    val p = plan("q_agg_groupby_sum")
    assert(p.contains("partial_sum"), p.take(800))
    assert(p.split("HashAggregate").length >= 3, p.take(800))
  }

  test("argmax-per-group uses the WindowGroupLimit top-k path") {
    val p = plan("q_argmax_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("batch ANN pushes per-query top-k below the shuffle and only " +
      "broadcasts the query batch") {
    val p = plan("q_ann_batch")
    // WindowGroupLimit: map tasks forward at most k rows per query
    assert(p.contains("WindowGroupLimit"), p.take(800))
    // the only broadcast is the query batch (corpus stays put)
    assert(p.split("BroadcastExchange").length <= 3, p.take(800))
  }

  test("near-dup similarity predicates stay inside join conditions") {
    // the declared key serves the cached (checkpointed) pair table, so the
    // plan property is asserted on the underlying builder — same approach
    // as the minhash test below
    val pj = operators.Dedup.ngramJaccardPairs(
      Tables.documents(spark, sf)).queryExecution.executedPlan.toString
    // since r10 the corpus side carries NO broadcast hint — the
    // broadcast below is Catalyst's size-based choice at this SF
    // (autoBroadcastJoinThreshold); a corpus past the threshold
    // shuffles both sides on the size key instead of being forced
    // node-local (the r9 verdict's watch item)
    assert(pj.contains("BroadcastHashJoin") &&
      pj.contains("sorted_long_intersect_count"), pj.take(900))
    val pe = plan("q_embed_near_dup")
    assert(pe.contains("BroadcastNestedLoopJoin") &&
      pe.contains("double_array_dot"), pe.take(900))
  }

  test("segment dedup: two data shuffles (segment, doc_id), no broadcast") {
    val p = plan("q_dedup_segments")
    assert(!p.contains("Broadcast"), p.take(1500))
    // hash exchanges: the survivor window keyed on seg, the reassembly
    // group on doc_id; the final orderBy adds a range exchange — no
    // other shuffle may appear (the corpus never broadcasts or
    // re-partitions redundantly)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 2, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("sequence packing reuses the window's source partitioning for " +
      "its groupBy (one data shuffle)") {
    val p = plan("q_pack_sequences")
    assert(!p.contains("Broadcast"), p.take(1500))
    // hashpartitioning(source) feeds the window AND satisfies the
    // (source, seq_id) grouping's clustering requirement — a second
    // hash exchange would mean the reuse broke
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("chunking and quantization plans are shuffle-free map passes") {
    val chunk = plan("q_chunk_overlap")
    val quant = plan("q_embed_quantize")
    for (p <- Seq(chunk, quant)) {
      assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
      assert(!p.contains("Broadcast"), p.take(1500))
    }
  }

  test("band join stays an equi-join: no cartesian, no nested loop") {
    val p = plan("q_join_band")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(1500))
    // the ×3 bucket explode is the declared prefilter mechanism
    assert(p.contains("Generate explode"), p.take(1500))
  }

  test("scd2 history build is one exchange + one folded Window") {
    val p = plan("q_scd2")
    assert(!p.contains("Broadcast"), p.take(1500))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
    // row_number and lead share the window spec → a single Window node
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows == 1, s"window nodes = $windows\n" + p.take(2000))
  }

  test("bpe pair counting: two vocab-sized shuffles, top-k as TakeOrdered") {
    val p = plan("q_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 2, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("iqr gate broadcasts only the group-stats row set") {
    val p = plan("q_outlier_iqr")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the corpus side itself must not hash-exchange more than its two
    // aggregations (stats agg + final agg)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 2, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("substring dedup shuffles gram HASHES, never gram text, and " +
      "joins without cartesian/nested-loop") {
    val p = plan("q_dedup_substring")
    // grams are xxhash64'd inside the projection stage — the shuffle key
    // is the 8-byte hash, not the ~50-token string
    assert(p.contains("xxhash64"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(1500))
    // first-occurrence selection is an aggregate (map-side combinable),
    // not a per-gram sort window
    assert(p.contains("partial_min"), p.take(2000))
  }

  test("shard shuffle is one shard-keyed exchange reused by the digest " +
      "aggregation") {
    val p = plan("q_shuffle_shards")
    assert(!p.contains("Broadcast"), p.take(1500))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("z-order audit: corpus side is map-only bit math plus one bucket " +
      "aggregation; only the 1-row range broadcasts") {
    val p = plan("q_zorder_layout")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
    // the range row is the only nested-loop (1-row broadcast — the
    // intended shape); no data-sized join exists in the plan
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"nested loops = $bnl\n" + p.take(2000))
  }

  test("span masking: one doc-keyed exchange shared by sweep and " +
      "aggregation, no joins") {
    val p = plan("q_span_mask")
    assert(!p.contains("Broadcast") && !p.contains("Join"), p.take(1500))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("cooc-pmi: vocab joins shuffle, only 1-row totals nested-loop") {
    val p = plan("q_cooc_pmi")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the two scalar totals (n_pairs, n_words) are the only permitted
    // nested-loop joins — both broadcast 1-row aggregates
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"nested-loop joins = $bnlj\n" + p.take(2000))
  }

  test("inverted index builds on one term shuffle, no broadcast") {
    val p = plan("q_inverted_index")
    assert(!p.contains("Broadcast"), p.take(1500))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("equi-depth binning: corpus side is map-only plus one group agg") {
    val p = plan("q_equidepth_bins")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // one hash exchange (the 10-group final agg); the cutpoint side
    // reduces through a SinglePartition exchange and broadcasts 1 row
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"hash exchanges = $hashEx\n" + p.take(2000))
  }

  test("rolling DAU: dedup-then-fan-out, never an inequality join") {
    val p = plan("q_rolling_dau")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(1500))
    // the ×7 day fan-out is a Generate inside the stage
    assert(p.contains("Generate explode"), p.take(1500))
    // count-distinct runs two-phase (partial on (day, user) first)
    assert(p.contains("partial_count(distinct"), p.take(2000))
  }

  test("event transitions: lead window on the corpus, prob window on " +
      "the matrix") {
    val p = plan("q_event_transitions")
    assert(!p.contains("Broadcast"), p.take(1500))
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows == 2, s"window nodes = $windows\n" + p.take(2000))
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti, not inner+distinct") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("TF-IDF/BM25 builders are fully lazy — no Spark job at plan time") {
    // Corpus size N must live in the plan (broadcast 1-row aggregate), not
    // in an eager driver-side count() that runs a scan per builder call.
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(js.stageInfos.map(_.name).mkString("; ")): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      operators.TextAnalysis.qTfidfTopTerms(spark, sf)
      operators.TextAnalysis.qBm25TopTerms(spark, sf)
      Thread.sleep(1000) // listener bus is async; let events drain
      // spark.read.parquet runs a footer/schema-inference job per call —
      // that is the scan, not the builder. Any OTHER job (an eager count()
      // would surface as "count at TextAnalysis.scala:…") is a regression.
      val actions = jobs.toArray(Array.empty[String])
        .filterNot(_.startsWith("parquet at Tables.scala"))
      assert(actions.isEmpty,
        s"builders triggered ${actions.length} action job(s): " +
          actions.mkString(" | "))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("TF-IDF/BM25 never broadcast vocabulary- or corpus-sized tables") {
    // The df table is vocabulary-sized (one row per distinct token) and the
    // old docLen join was corpus-sized — both exceeded broadcast limits at
    // web scale. Locked shape: the tok join shuffles (ShuffledHashJoin);
    // the only broadcasts are the 1-row scalar aggregates (N, total token
    // count), which plan as Cross-type BroadcastNestedLoopJoins. Any
    // BroadcastHashJoin in the initial plan means a data-sized side
    // regained a broadcast hint.
    for (q <- Seq("q_tfidf_topterms", "q_bm25_topterms")) {
      val p = plan(q)
      assert(p.contains("ShuffledHashJoin"), s"$q: ${p.take(900)}")
      assert(!p.contains("BroadcastHashJoin"), s"$q: ${p.take(900)}")
      assert(!p.linesIterator.exists(l =>
        l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")),
        s"$q: ${p.take(900)}")
    }
  }

  test("BM25 search broadcasts ONLY the query-term table") {
    // The postings side is corpus-sized and must reach the query join
    // shuffled/pre-aggregated; the only BroadcastHashJoin allowed is the
    // 24-row query-term build side. The underlying tf ⋈ df joins keep
    // the locked shuffled shape from the test above.
    val p = plan("q_bm25_search")
    assert(p.contains("ShuffledHashJoin"), p.take(900))
    val bhj = p.linesIterator.count(l => l.contains("BroadcastHashJoin"))
    assert(bhj === 1, s"expected exactly the qterms broadcast, got $bhj:\n" +
      p.take(900))
  }

  test("decontamination broadcasts only the benchmark gram set") {
    // The corpus side is unbounded; the eval set is small by definition.
    // Locked shape: a BroadcastHashJoin whose build side is the benchmark
    // grams — the corpus gram stream must NOT sort-merge (which would
    // shuffle the full corpus gram table on the gram string).
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("subqueries decorrelate to semi/anti/outer joins — no per-row " +
      "subplans") {
    // The declared EXISTS/NOT EXISTS/scalar/NOT IN surface (Subqueries
    // .scala) only scales if Catalyst rewrites each subquery into a JOIN
    // executed once; a surviving subquery node means a separate pass (or,
    // worse, per-row re-execution) over a fact-sized table.
    assert(plan("q_exists_semi").contains("LeftSemi"))
    val pn = plan("q_not_exists")
    assert(pn.contains("LeftAnti") && pn.contains("LeftSemi"), pn.take(1500))
    assert(plan("q_scalar_subquery").contains("LeftOuter"))
    assert(plan("q_not_in").contains("LeftAnti"))
    for (q <- Seq("q_exists_semi", "q_not_exists", "q_scalar_subquery",
        "q_not_in"))
      assert(!plan(q).contains("Subquery"), s"$q kept a subquery subplan")
    // nested IN chains (Q20 shape): BOTH levels rewrite to semi joins
    val pq20 = plan("q_nested_in")
    assert(pq20.split("LeftSemi").length >= 3, pq20.take(1500))
    assert(!pq20.contains("Subquery"), pq20.take(1500))
  }

  test("scalar gates: uncorrelated gate runs once and reaches the scan; " +
      "correlated avg filter decorrelates to a threshold join") {
    // q_scalar_gate's global average is UNCORRELATED — the correct shape
    // is a one-time scalar subquery whose result gates the scan as a
    // pushed filter (plus the LeftAnti for the NOT EXISTS).
    val pg = plan("q_scalar_gate")
    assert(pg.contains("LeftAnti"), pg.take(1500))
    assert(pg.contains("ScalarSubquery"), pg.take(1500))
    // q_scalar_avg_filter's per-part average IS correlated — it must
    // decorrelate to an aggregate joined back with the threshold riding
    // the join condition, never a surviving subquery.
    val pa = plan("q_scalar_avg_filter")
    assert(pa.contains("avg(l_quantity)"), pa.take(1500))
    assert(!pa.contains("Subquery"), pa.take(1500))
  }

  test("LATERAL derived tables decorrelate: top-k via WindowGroupLimit, " +
      "aggregate via one outer join") {
    // LATERAL ... ORDER BY ... LIMIT 1 must become the two-phase ranking
    // plan (WindowGroupLimit below a key join) — the same shape as
    // q_argmax_per_group, reached from SQL. A surviving subquery would
    // re-run orders once per customer.
    val pt = plan("q_lateral_topk")
    assert(pt.contains("WindowGroupLimit"), pt.take(1200))
    assert(!pt.contains("Subquery"), pt.take(1200))
    val pa = plan("q_lateral_agg")
    assert(pa.contains("LeftOuter"), pa.take(1200))
    assert(!pa.contains("Subquery"), pa.take(1200))
  }

  test("doc⋈embedding join carries no broadcast hint (both sides scale " +
      "with the corpus)") {
    // embeddings is one row per document — NOT a dim. A broadcast hint here
    // forces a driver-melting broadcast at 100×. The join must be left
    // unhinted: Catalyst/AQE may still pick broadcast when the build side
    // is genuinely small at runtime, but the plan must not mandate it.
    val qe = SparkEntry.queries("q_doc_embedding_join")(spark, sf)
      .queryExecution
    assert(!qe.analyzed.toString.contains("ResolvedHint"),
      qe.analyzed.toString.take(900))
    assert(!qe.optimizedPlan.toString.contains("strategy=broadcast"),
      qe.optimizedPlan.toString.take(900))
  }

  test("minhash verify join is shuffle-based, never a corpus broadcast") {
    // The LSH path is the declared 100 TB route: re-attaching shingles for
    // verification must shuffle on doc_id. A broadcast of the corpus-sized
    // signature table (the round-1 shape) dies at cluster scale.
    val p = operators.Dedup.minhashPairs(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p.take(900))
    assert(!p.contains("BroadcastExchange"), p.take(900))
  }

  test("affinity edge build: pair join keys on order id, threshold is " +
      "a broadcast 1-row gate, aggregation partial-then-final") {
    val df = operators.Graph.significantEdges(
      operators.Graph.coSupplierCooc(Tables.lineitem(spark, sf)))
    val p = df.queryExecution.executedPlan.toString
    // the self-join on the order key is an equi-join, never a cartesian
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the 2σ cut joins as a broadcast of the single moment row
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(1200))
    // co-occurrence counting partial-aggregates map-side
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(1200))
  }

  test("fixed-point pagerank iteration joins shuffle on the node key " +
      "and aggregate partially — no broadcast of the rank table") {
    val edges = operators.Graph.significantEdges(
      operators.Graph.coSupplierCooc(Tables.lineitem(spark, sf)))
      .localCheckpoint()
    val p = operators.Graph.pagerankFixedPoint(edges, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("DSIR weights: the log-ratio table joins back as a BROADCAST " +
      "(256-row side), never a corpus-sized shuffle or cartesian") {
    val p = operators.Curation.qDsirWeights(spark, sf)
      .queryExecution.executedPlan.toString
    // feature-stream ⋈ ratio must be the hinted broadcast hash join
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the only BroadcastNestedLoopJoins allowed are the 1-row totals
    // cross joins; they appear at most twice (totals into ratio)
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"$bnlj BNLJs\n${p.take(1500)}")
  }

  test("bucketed embedding near-dup has no data-sized nested-loop join") {
    // Only the k-row centroid/cluster-pair sides may broadcast; the member
    // verify join must be a shuffle equi-join with the exact predicate in
    // its condition. An `Inner` BNLJ (the brute-force all-pairs shape) must
    // not appear — the crossJoin-with-k-centroids BNLJs are `Cross` type.
    // Built via the library function: the declared key serves the cached
    // (checkpointed) pair table (same approach as the dedup plan tests).
    val df = operators.Similarity.nearDupPairsBucketed(
      Tables.embeddings(spark, sf), threshold = 0.4, k = 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("Inner")), p.take(1200))
  }

  test("OPQ search: top-k is TakeOrdered, only shortlist/query broadcast") {
    val p = plan("q_ann_opq")
    // both the ADC shortlist selection and the final top-k must plan as
    // TakeOrderedAndProject — never a global sort of the corpus
    assert(p.contains("TakeOrderedAndProject"), p.take(900))
    assert(!p.contains("Exchange rangepartitioning"), p.take(1500))
    // broadcasts: the 50-row candidate list and the 1-row query vector —
    // the codes/corpus scans must never broadcast
    val be = p.linesIterator.count(_.contains("BroadcastExchange"))
    assert(be <= 2, s"$be broadcasts\n${p.take(1500)}")
  }

  test("partition evolution: the transition union reads BOTH layouts, " +
      "plus one partitions-only scan for the precedence list") {
    val p = plan("q_partition_evolution")
    assert(p.contains("day_layout") && p.contains("hour_layout"),
      p.take(1500))
    // two data scans + the hour layout's day-list scan (precedence
    // anti-join side) — which must read NO data columns
    val scanLines = p.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(scanLines.length === 3, s"${scanLines.length} scans\n" +
      p.take(2000))
    assert(scanLines.exists(_.contains("ReadSchema: struct<>")),
      "precedence-list scan reads data columns:\n" +
        scanLines.mkString("\n"))
  }

  test("streaming DSIR gate final scoring joins the landed counts " +
      "against a BROADCAST ratio table") {
    val p = plan("q_stream_dsir_gate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }
}
