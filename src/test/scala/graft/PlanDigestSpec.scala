package graft

/** Locks for the PLANS_DIGEST normalizer (tools/PlanDigest.scala): the
  * digest is only useful as a cross-round regression gate if identical
  * plans digest identically across sessions. The two failure modes
  * found while building it — JVM identity hashes of array-typed
  * expression arguments ([J@1a2b3c) and JIT lambda-class addresses
  * (Lambda$123/0x7f…) — are pinned here on the queries that exhibited
  * them, plus the rewrite rules themselves on synthetic strings.
  */
class PlanDigestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("normalizer strips session counters, identity hashes, and " +
      "lambda addresses") {
    val n = tools.PlanDigest.normalize(
      "Project [a#123L, b#45] plan_id=678 [J@1a2b3cff " +
        "graft.X$$Lambda$2687/0x00007fa4bcde9db8@4e9d1119 " +
        "Statistics(sizeInBytes=29.9 KiB, rowCount=500) /tmp/graft_x_9 " +
        "g7_ab12cd_orders local-1786695622440")
    assert(!n.contains("#123"), n)
    assert(!n.contains("1a2b3c"), n)
    assert(!n.contains("0x00007f"), n)
    assert(!n.contains("29.9"), n)
    assert(!n.contains("ab12cd"), n)
    assert(!n.contains("1786695622440"), n)
  }

  test("short identity hashes normalize too: toHexString pads nothing, " +
      "so a sub-0x100000 hash prints <6 digits (the round-12 " +
      "q_minhash_source_sketch digest flap)") {
    val n = tools.PlanDigest.normalize(
      "minhash_sig(x, [J@4e3d2, [J@1f) AS sig [J@abcdef01")
    assert(!n.contains("4e3d2") && !n.contains("@1f") &&
      !n.contains("abcdef01"), n)
    assert(n === "minhash_sig(x, [J@_, [J@_) AS sig [J@_", n)
  }

  test("PLANS_DIGEST.json covers exactly the declared surface (no " +
      "stale or missing keys)") {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS_DIGEST.json")), "UTF-8")
    val keys = "\"(q_[a-z0-9_]+)\"".r.findAllMatchIn(json)
      .map(_.group(1)).toSet
    val declared = Registry.all.map(_.name).toSet
    assert(keys === declared,
      s"stale=${(keys -- declared).toSeq.sorted.take(5)} " +
        s"missing=${(declared -- keys).toSeq.sorted.take(5)}")
    assert(!json.contains("\"ERROR\""), "a digest recorded ERROR")
  }

  test("metadata truncation is disabled while digesting: a truncation-" +
      "prone plan digests identically before and after other planning") {
    // q_funnel's events FileScan carries DataFilters longer than the
    // 100-char default cut; with truncation on, the cut offset shifts
    // with raw expr-id widths and the digest drifts with session
    // HISTORY (the round-9 finding). digestMap raises the limit — this
    // pins the before/after-planning equality under that setting.
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try {
      def dg() = tools.PlanDigest.normalize(
        SparkEntry.queries("q_funnel")(spark, sf)
          .queryExecution.executedPlan.toString)
      val before = dg()
      // widen the session's expr-id counter substantially
      for (q <- Seq("q_agg_groupby_sum", "q_join_equi_inner", "q_funnel"))
        SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      assert(dg() === before)
      assert(!before.contains("..."), "plan still truncated")
    } finally
      spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  test("the historically-unstable plans digest identically across two " +
      "in-session builds") {
    for (q <- Seq("q_minhash_source_sketch", "q_multimodal_features")) {
      val p1 = tools.PlanDigest.normalize(
        SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString)
      val p2 = tools.PlanDigest.normalize(
        SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString)
      assert(p1 === p2, q)
    }
  }
}
