package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.{Dedup, Events, Similarity}

/** Scale-stress probe: replicates the sf0.1 tables ×N with shifted keys
  * and runs the heaviest operators, to answer "does the plan survive a
  * 10× scale-up, and how does it scale?" — the evidence BASELINE.md §D
  * records. Replication makes every doc part of an N-way exact-duplicate
  * cluster, which stresses dedup candidate generation far harder than
  * organic data (every LSH bucket is hot). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, idCol: String): DataFrame =
      (0 until n).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 10_000_000L)))
        .reduce(_ unionByName _)

    // local-iteration escape hatch: run only probes whose label contains
    // the filter substring (unset → all probes, unchanged contract)
    val probeFilter = sys.env.get("SPARK_GRAFT_PROBE_FILTER")
    def time(label: String)(f: => Long): Unit =
      if (probeFilter.forall(label.contains)) {
        System.gc()
        val t0 = System.nanoTime()
        val rows = f
        println(
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $label ($rows rows)")
      }

    val docs = replicate(Tables.documents(spark, d), "doc_id")
    val orders = replicate(Tables.orders(spark, d), "o_orderkey")
    val lineitem = replicate(Tables.lineitem(spark, d), "l_orderkey")
    val events = replicate(Tables.events(spark, d), "event_id")
    val embs = replicate(Tables.embeddings(spark, d), "vec_id")

    println(s"== scale probe: ${n}x sf0.1 ==")
    time(s"minhash LSH near-dup over ${n}x docs")(
      Dedup.minhashPairs(docs).count())
    time(s"simhash banding over ${n}x docs")(
      Dedup.simhashPairs(docs).count())
    time(s"exact dedup over ${n}x docs")(
      docs.groupBy(md5(to_binary(lower(regexp_replace(col("text"),
        "\\s+", " ")), lit("utf-8"))).as("fp"))
        .agg(min("doc_id").as("keep")).count())
    time(s"groupBy-sum over ${n}x lineitem")(
      lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          count(lit(1)).as("c")).count())
    time(s"argmax-per-group over ${n}x orders")(
      orders.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
        .filter(col("rn") === 1).count())
    time(s"tumbling windows over ${n}x events")(
      Events.tumblingAgg(events).count())
    time(s"cosine top-10 over ${n}x embeddings")(
      Similarity.cosineTopK(embs, 0L, 10).count())
    time(s"embedding near-dup pairs over ${n}x embeddings")(
      Similarity.nearDupPairs(embs, 0.4).count())
    time(s"BUCKETED embedding near-dup over ${n}x embeddings")(
      Similarity.nearDupPairsBucketed(embs, 0.4, k = 10).count())
    // localMaxPairs = 0: the stress probe must exercise the DISTRIBUTED
    // pointer-jumping loop, not the driver union-find fast path.
    time(s"connected components over LSH pairs of ${n}x docs") {
      val c = Dedup.connectedComponents(Dedup.minhashPairs(docs),
        localMaxPairs = 0L).count()
      println(s"          cc regime: ${Dedup.lastCcPath}")
      c
    }

    // Round-3 adversarial probes.
    // (a) TRUE hot-bucket case: a 500-doc slice duplicated 100-way — every
    // LSH bucket is 100 wide (> HotBucketCap), so candidate generation
    // must degrade to star links (O(m) per bucket) instead of the ~2.5M
    // all-pairs rows the uncapped join would emit.
    val slice = Tables.documents(spark, d).orderBy("doc_id").limit(500)
    val dup100 = (0 until 100).map(i =>
      slice.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10_000_000L)))
      .reduce(_ unionByName _)
    time("HOT-BUCKET capped LSH: 500 docs x 100-way duplicated")(
      Dedup.minhashPairs(dup100).count())
    // (b) hot-cluster splitting: every vector a 10-way duplicate → one
    // quantizer cell per duplicate blob; the cap recurses k-means inside
    // the over-populated cells while keeping results exact.
    time(s"CAPPED bucketed embedding near-dup over ${n}x embeddings")(
      Similarity.nearDupPairsBucketedCapped(embs, 0.4, k = 10,
        cap = 4000).count())

    // Round-6 probes: the mutation and decorrelation paths at scale.
    // (a) MERGE: 10% of a replicated orders table re-priced — the upsert
    // must stay one key shuffle regardless of base size.
    time(s"upsertByKey over ${n}x orders (10% update batch)") {
      val upd = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      graft.functions.ScalePatterns.upsertByKey(orders, upd, "o_orderkey")
        .count()
    }
    // (b) idempotent re-land: land the replicated events day-partitioned,
    // then dynamic-overwrite ONE day — cost must track the day, not the
    // table (the other 29 partitions' files are never rewritten).
    time(s"dynamic-partition re-land of 1 of 30 days over ${n}x events") {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_scaleprobe_byday_" +
        spark.sparkContext.applicationId
      val ev = events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      graft.sources.Sources.writePartitioned(ev, dir, "day")
      ev.filter(col("day") === "2024-01-10")
        .withColumn("value", col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(dir)
      spark.read.parquet(dir).count()
    }
    // (c) Q21 decorrelation: EXISTS + NOT EXISTS over the replicated fact
    // — the rewrite's three lineitem passes must all be key-partitioned
    // shuffles (a surviving per-row subplan would be quadratic here).
    time(s"Q21 NOT EXISTS decorrelation over ${n}x lineitem") {
      orders.createOrReplaceTempView("g_orders")
      lineitem.createOrReplaceTempView("g_lineitem")
      Tables.supplier(spark, d).createOrReplaceTempView("g_supplier")
      spark.sql(graft.operators.Subqueries.notExistsSql).count()
    }
    // Round-6 part-3 probes: temporal relations + the tokenizer kernel.
    // (a) band join: replicas share user_id AND ts, so every original
    // within-band pair fans out ~n² — the adversarial densification for
    // the bucketed prefilter (buckets get n× hotter, the equi-join must
    // absorb it without a nested loop).
    time(s"band join (300 s) over ${n}x events")(
      graft.operators.Temporal.bandJoinPairs(events, 300L).count())
    // (b) SCD2: ×n orders per customer → n× longer version chains
    // through the same single-exchange window plan.
    time(s"SCD2 history build over ${n}x orders")(
      orders.withColumn("version", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
            .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
        .count())
    // (c) BPE pair counting: the corpus is ×n but its VOCABULARY is
    // unchanged — the pair-explosion stage's cost must stay flat (only
    // the word-count shuffle sees the replication).
    time(s"BPE pair counting over ${n}x docs") {
      val words = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      words.select(col("freq"),
          concat(regexp_extract_all(col("word"), lit("."), lit(0)),
            array(lit("</w>"))).as("sym"))
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => concat_ws(" ", element_at(col("sym"), i),
            element_at(col("sym"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt")).count()
    }
    // Round-7 probe: exact-substring dedup. Replication makes EVERY
    // 50-token window an n-way duplicate — the worst case for the
    // gram-hash shuffle (corpus-sized, ~20 bytes/token) and the per-doc
    // interval sweep (every doc emits its full window list as dup
    // occurrences). Cost must stay corpus-linear: both stages are plain
    // hash partitions, nothing quadratic in duplicate multiplicity.
    time(s"substring dedup (w=50) over ${n}x docs")(
      Dedup.substringDedup(docs, 50).count())
    // Round-8 probes (VERDICT item 1): two-datapoint scale evidence for
    // the heavy three — run this tool at SPARK_GRAFT_REPLICATE=10 AND
    // =100 and compare walls (linear = 10×; SCALE.md records both).
    // (a) the gram recompute-vs-cache trade-off measured, not argued:
    time(s"substring dedup CACHED-GRAMS (w=50) over ${n}x docs")(
      Dedup.substringDedup(docs, 50, cacheGrams = true).count())
    // (b) the full curation chain (features → exact dedup → LSH →
    // CC → quality gate → split), pair table built in-probe:
    time(s"corpus curate (full chain) over ${n}x docs") {
      val c = graft.operators.Pipeline.curateCorpus(docs, 0.3, None).count()
      // regime observability: which CC path the chain took under its
      // normal conf (no localMaxPairs override) at this replication
      println(s"          cc regime inside curate: ${Dedup.lastCcPath}")
      c
    }
    // Round-8 part-3 probe: the shard lifecycle at scale. Land the
    // replicated corpus fragmented (many files per shard — the state an
    // append-heavy landing reaches), then compact. Both passes are one
    // shard-keyed write each; the probe proves the pair stays
    // corpus-linear and the compacted layout lands one file per shard.
    time(s"shard land (fragmented) + compact over ${n}x docs") {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_scaleprobe_shards_" +
        spark.sparkContext.applicationId
      graft.operators.Curation.writeShards(docs, s"$dir/frag", 32,
        maxRecordsPerFile = 2000)
      graft.operators.Curation.compactShards(spark, s"$dir/frag",
        s"$dir/compact", 32)
      val files = spark.read.parquet(s"$dir/compact")
        .select(input_file_name()).distinct().count()
      println(s"          compacted files: $files (shards: 32)")
      spark.read.parquet(s"$dir/compact").count()
    }
    // Round-8 part-2 probes: the graph family and the blocked fuzzy join.
    // (a) affinity graph: replication multiplies ORDERS (the corpus-sized
    // side) while the supplier node set is fixed — edge GENERATION must
    // scale with the corpus while the metric stages (triangles, ranks)
    // cost only the graph. Co-occurrence counts rise ×n uniformly, so
    // the 2σ cut keeps a comparable edge set.
    // Edge build materialized once (the declared queries' cachedEdges
    // discipline — a deployment persists the edge table), then each
    // metric timed on the built graph: build cost is corpus-linear,
    // metric cost depends only on the graph.
    var g8: DataFrame = null
    time(s"affinity edge build (2-sigma cut) over ${n}x lineitem") {
      g8 = graft.operators.Graph.significantEdges(
        graft.operators.Graph.coSupplierCooc(lineitem)).localCheckpoint()
      g8.count()
    }
    if (g8 != null) {
      time("triangle count on the built affinity graph")(
        graft.operators.Graph.triangleCount(g8)
          .head.getAs[Long]("n_triangles"))
      time("pagerank(3 iters) on the built affinity graph")(
        graft.operators.Graph.pagerankFixedPoint(g8, 3).count())
    }
    // (b) fuzzy join under ADVERSARIAL duplication: replicated suppliers
    // keep their names, so every identity blocking key is an n-wide hot
    // bucket (n² dist-0 candidate pairs per name) — the blocked join
    // must absorb the densification without a nested loop, exactly the
    // LSH hot-bucket regime.
    val supp10 = replicate(Tables.supplier(spark, d), "s_suppkey")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
    time(s"blocked fuzzy join over ${n}x suppliers (names duplicated)")(
      graft.operators.Entity.fuzzyPairs(supp10, 1).count())
    // Round-8 part-7 probes: the literal-TPC-H and rollup closers.
    // (a) Q21 one-pass rewrite: the EXISTS+NOT-EXISTS pair as a single
    // per-order aggregation — one shuffle on the order key; contrast
    // with the three-pass notExistsSql probe above. Replication widens
    // every order's supplier set ×n (countDistinct state grows), which
    // is exactly the stress the one-pass form must absorb map-side.
    time(s"TPC-H Q21 one-pass rewrite over ${n}x lineitem+orders")(
      graft.operators.Olap2.waitingSuppliers(lineitem, orders).count())
    // (b) rollup build + additive merge: build cost is fact-linear (the
    // nightly job); the 90/10 partial merge must stay rollup-sized.
    time(s"daily rollup build + additive 90/10 merge over ${n}x lineitem") {
      val r = graft.operators.Olap2.rollupOf(
        lineitem.filter(pmod(col("l_orderkey"), lit(10L)) < 9))
        .unionByName(graft.operators.Olap2.rollupOf(
          lineitem.filter(pmod(col("l_orderkey"), lit(10L)) >= 9)))
        .groupBy("day", "l_returnflag")
        .agg(sum(col("qty_d")).as("qty_d"), sum(col("rev_d")).as("rev_d"),
          sum(col("n_items")).as("n_items"))
      r.count()
    }
    // (c) DSIR weights: feature hashing is map-side, count tables are
    // 256 rows, so the cost must track the corpus scan, not the join.
    time(s"DSIR importance weights over ${n}x docs") {
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val toks = docs.select(col("doc_id"), col("lang"),
          split(trim(col("text")), "\\s+").as("t")).repartition(parts)
      val feats = toks.select(col("doc_id"), col("lang"),
          explode(col("t")).as("f"))
        .withColumn("b",
          (expr("instr('0123456789abcdef', substring(md5(f), 1, 1))") - 1)
            * 16 +
          (expr("instr('0123456789abcdef', substring(md5(f), 2, 1))") - 1))
      val srcCnt = feats.groupBy("b").agg(count(lit(1)).as("c_s"))
      val tgtCnt = feats.filter(col("lang") === "en")
        .groupBy(col("b").as("tb")).agg(count(lit(1)).as("c_t"))
      val ratio = srcCnt.join(tgtCnt, col("b") === col("tb"), "left_outer")
        .na.fill(0L, Seq("c_t"))
        .select(col("b"), (col("c_t") - col("c_s")).as("lr"))
      feats.join(broadcast(ratio), "b")
        .groupBy("doc_id").agg(sum("lr")).count()
    }
    // (d) snapshot diff: one co-partitioned full-outer join on the key.
    time(s"corpus snapshot diff over ${n}x docs") {
      val cur = docs.select(col("doc_id"), md5(col("text")).as("dg"))
      val nxt = docs.filter(pmod(col("doc_id"), lit(50L)) =!= 7)
        .select(col("doc_id").as("n_id"),
          md5(concat(col("text"), lit("x"))).as("n_dg"))
      cur.join(nxt, col("doc_id") === col("n_id"), "full_outer")
        .select(when(col("doc_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("dg") =!= col("n_dg"), "changed")
          .otherwise("unchanged").as("status"))
        .groupBy("status").count().count()
    }
    // Round-9 probe: BPE merge-round scaling (VERDICT r8 item 6). The
    // 1-job-per-merge greedy loop is linear in MERGE COUNT, not corpus
    // size — a 32k-merge vocab means 32k sequential vocab-sized jobs.
    // Frequency-ordered batched merges (symbol-disjoint batches applied
    // in one fold) divide the round count by the batch cap; this probe
    // measures both at 256 merges over the sf0.1 vocabulary.
    time("BPE pure-greedy 256 merges over sf0.1 vocab") {
      val words = Tables.documents(spark, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      graft.operators.TextAnalysis.bpeTrainFull(words, 256)._2.count()
    }
    time("BPE batched 256 merges (cap=32) over sf0.1 vocab") {
      val words = Tables.documents(spark, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      graft.operators.TextAnalysis
        .bpeTrainBatched(words, 256, 32)._2.count()
    }
    spark.stop()
  }
}
