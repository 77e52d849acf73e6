package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}
object Bench {
  /** Force FULL evaluation of a query result: hash every column of every
    * row and reduce to one Long. Under a bare `count()` Catalyst prunes
    * projections and eliminates sorts, so per-row-expression queries would
    * be timed as little more than scan+count; hashing all output columns
    * makes the timed pass execute the expression work the query declares.
    * KNOWN EXCLUSION: a final global `orderBy` beneath this aggregate is
    * still removed by EliminateSorts, so each query's trailing
    * determinism sort (present only for the driver's hash compare) stays
    * untimed. That is the intended measurement — the sorts are oracle
    * plumbing, not operator work — but sort-heavy queries are accordingly
    * timed WITHOUT their final sort. */
  private def force(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // local-iteration escape hatch: time a comma-separated subset
    // (unset in the driver run → full set, unchanged contract)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSet)
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup pass at the bench SF: triggers codegen compilation and
    // C2 JIT of the hot loops so the timed pass measures steady-state
    // engine throughput (BASELINE.md Part B: "warm JVM within a single
    // SparkSession"), not first-iteration compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    val queries = filter match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    queries.foreach { case (_, fn) =>
      try force(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    // >=2 timed passes (VERDICT r6 item 7): single-shot timings on this
    // shared box swing with ambient load, so the committed artifact
    // carries each query's MEDIAN and MIN across the in-session passes —
    // round-to-round regressions become decidable without quiet-box
    // forensics, and one-time init costs (first stateful streaming query)
    // show up as the median/min gap instead of silently inflating a row.
    // 3 passes since round 8: two-pass medians still let one ambient spike
    // pollute the median (it becomes the mean of the two passes); with
    // three, the median ignores a single outlier and the min/median/spread
    // triple in BENCH_DETAIL makes box noise separable from plan
    // regressions (BASELINE.md §C states the decision rule: compare MINs).
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // name -> per-pass (elapsed_sec, ok): a crashing query must surface
    // as a sentinel, never as a plausible-looking timing.
    val perPass: Seq[Map[String, (Double, Boolean)]] =
      (1 to passes).map { _ =>
        // The warmup (even at a smaller SF when warmDir == sfDir)
        // populates the session-level pair-table artifact caches, so
        // without this no TIMED query would ever pay the
        // shingle→band→verify cost (ADVICE r4). Clearing before EACH
        // pass makes that pass's first consumer rebuild the artifact —
        // the pair-table construction lands in every pass exactly once,
        // keeping passes comparable (a real pipeline run computes it
        // once and reuses it).
        graft.operators.Dedup.clearPairCaches()
        // same discipline for the graph increment's base pair table
        // (r14 VERDICT item 2: no on-disk artifact backs it, so it must
        // not ride the warmup into every timed pass)
        graft.operators.Graph.clearPairCaches()
        queries.map { case (name, fn) =>
          // GC between queries: lets Spark's ContextCleaner release the
          // previous query's broadcasts so their collection doesn't land
          // inside the next query's timed window.
          System.gc()
          val t0 = System.nanoTime()
          val ok = try { force(fn(spark, sfDir)); true }
            catch { case _: Throwable => false }
          name -> (((System.nanoTime() - t0) / 1e9, ok))
        }
      }
    // per-query median (even count: mean of middle two) and min over the
    // passes; a query failing ANY pass is reported failed
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      (s((n - 1) / 2) + s(n / 2)) / 2.0
    }
    val results: Map[String, (Double, Boolean)] =
      queries.keys.map { name =>
        val runs = perPass.map(_(name))
        name -> ((median(runs.map(_._1)), runs.forall(_._2)))
      }.toMap
    // min and spread (max-min) carry the same ok-gating as the median: a
    // query that crashed in ANY pass must never present a plausible-looking
    // timing in any column (ADVICE r7).
    val mins: Map[String, (Double, Boolean)] =
      queries.keys.map { name =>
        val runs = perPass.map(_(name))
        name -> ((runs.map(_._1).min, runs.forall(_._2)))
      }.toMap
    val spreads: Map[String, (Double, Boolean)] =
      queries.keys.map { name =>
        val runs = perPass.map(_(name))
        val ts = runs.map(_._1)
        name -> ((ts.max - ts.min, runs.forall(_._2)))
      }.toMap
    // The driver captures only the last ~2000 chars of output, and the full
    // per-query map (~100 entries at double precision) overflows that
    // window — rounds 2 and 3 both arrived truncated and unparseable
    // ("parsed": null). So: the FULL map goes to BENCH_DETAIL.json in the
    // repo, and the printed one-line JSON carries the summary stats the
    // baseline targets are stated in (total / median / worst, BASELINE.md
    // Part B) plus the slowest queries — compact enough to survive the
    // window with room to grow.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qjson(entries: Iterable[(String, (Double, Boolean))]): String =
      entries.map { case (k, (v, ok)) =>
        "\"" + k + "\":" + (if (ok) fmt(v) else "-1")
      }.mkString("{", ",", "}")
    val errors = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // LIFECYCLE vs PURE split (VERDICT r10 item 8): lifecycle keys
    // re-run artifact WRITES inside every timed pass by design — the
    // streaming replays (a checkpointed micro-batch run per pass) and
    // the declared write-path keys (landing, migration, day compaction,
    // shard compaction, the JSON sink roundtrips). Their cost scales
    // with the artifact work they stage, not with query throughput, so
    // envelope drift stays attributable: the pure class tracks engine
    // regression, the lifecycle class tracks surface growth.
    def isLifecycle(name: String): Boolean =
      name.startsWith("q_stream_") || Set(
        "q_compact_shards", "q_landing_partitioned", "q_landing_overwrite",
        "q_partition_migrate", "q_partition_compact",
        "q_scan_json", "q_scan_json_corrupt",
        "q_table_lifecycle", "q_table_vacuum", "q_table_expire",
        "q_table_auto_maintain",
        "q_table_maintenance_lifecycle").contains(name)
    def classJson(pred: String => Boolean): String = {
      val ts = results.collect { case (k, (v, true)) if pred(k) => v }
      s"""{"n":${ts.size},"total":${fmt(ts.sum)}}"""
    }
    val classes = s""""classes":{"lifecycle":${classJson(isLifecycle)},""" +
      s""""pure":${classJson(!isLifecycle(_))}}"""
    val okTimes = results.collect { case (_, (v, true)) => v }.toIndexedSeq.sorted
    val total = okTimes.sum
    val medianAll = if (okTimes.isEmpty) 0.0 else median(okTimes)
    val worst = if (okTimes.isEmpty) 0.0 else okTimes.last
    val slowest = results.toIndexedSeq.sortBy { case (_, (v, _)) => -v }.take(10)
    // One hash over every declared query's normalized executed-plan
    // digest (tools/PlanDigest): the per-round bench artifact carries it
    // so the driver can detect plan drift mechanically — a changed
    // plans_digest with unchanged queries means a PLAN changed even when
    // timing noise masks it (VERDICT r8 item 7). NOT free: digestMap
    // invokes every declared builder, and a handful execute real jobs on
    // CONSTRUCTION (the streaming replays, the landing-overwrite /
    // shard-compaction / partition-migration staging writes) — most
    // reuse per-app staged artifacts already built during the timed
    // passes, so the tail costs well under one timed pass. It runs
    // AFTER the last timed pass, so the timings above are unaffected
    // either way (ADVICE r9).
    val plansDigest = filter match {
      case Some(_) => "filtered" // partial surface must not look whole
      case None => tools.PlanDigest.rollupDigest(spark, sfDir)
    }
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$passes,$classes,"queries":${qjson(results)},"min":${qjson(mins)},"spread":${qjson(spreads)},"errors":$errors,"plans_digest":"$plansDigest","sf":"$sfDir"}"""
    // Resolve against the repo root, not the process CWD (sbt forks the
    // run; an overridden fork directory must not scatter the artifact).
    val repoRoot = sys.env.get("SPARK_GRAFT_REPO")
      .orElse(sys.props.get("graft.repo.root"))
      .getOrElse(sys.props("user.dir"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(repoRoot).resolve("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"runs":$passes,"median":${fmt(medianAll)},"worst":${fmt(worst)},$classes,"queries":${qjson(slowest)},"errors":$errors,"plans_digest":"$plansDigest","detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
