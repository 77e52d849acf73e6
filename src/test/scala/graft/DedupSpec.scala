package graft

import org.apache.spark.sql.functions._

/** Dedup-operator behavior on constructed documents with known overlap. */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** A scratch documents dir is overkill — the operators take a dir, so
    * these tests use the testdata and cross-check operators against each
    * other (MinHash+LSH must recover what brute force finds). */

  test("exact dedup keeps the lowest doc_id per text") {
    val out = operators.Dedup.qDedupExact(spark, sf)
    // sf0.001 has no duplicate texts: output must equal the full table
    assert(out.count() === Tables.documents(spark, sf).count())
  }

  test("MinHash+LSH recovers the brute-force near-dup pairs on testdata") {
    val brute = operators.Dedup.qDedupNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = operators.Dedup.qDedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified with exact Jaccard, so lsh ⊆ brute;
    // at j >= 0.8 with 8 bands × 4 rows recall is ~1 — require equality.
    assert(lsh === brute)
    assert(brute.nonEmpty)
  }

  test("segment dedup removes repeated boilerplate and keeps first use") {
    import spark.implicits._
    // doc 1 owns segments A B; doc 2 repeats A (boilerplate) + fresh C;
    // doc 3 is entirely doc 1's content and must vanish outright
    val a = (1 to 4).map(i => s"a$i").mkString(" ")
    val b = (1 to 4).map(i => s"b$i").mkString(" ")
    val c = (1 to 4).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$a $c"), (3L, s"$b $a"))
      .toDF("doc_id", "text")
    val out = operators.Dedup.segmentDedup(docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, 2L, s"$a $b"), (2L, 1L, c)))
  }

  test("substring dedup: interval union over overlapping duplicate windows") {
    import spark.implicits._
    // doc 1 owns a 60-token run C; doc 2 embeds C between unique pad
    // tokens — its 11 duplicated 50-windows overlap into ONE 60-token
    // span (a naive per-span sum would report 550); doc 3 repeats a
    // 50-token run back-to-back — exactly one window (the second
    // occurrence's start) duplicates, covering 50 tokens.
    val c = (1 to 60).map(i => s"c$i").mkString(" ")
    val r = (1 to 50).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, c),
      (2L, s"p1 p2 p3 p4 p5 $c s1 s2 s3 s4 s5"),
      (3L, s"$r $r"))
      .toDF("doc_id", "text")
    val out = operators.Dedup.substringDedup(docs, 50)
      .select("doc_id", "n_tok", "dup_tokens").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(out.toSeq === Seq((2L, 70L, 60L), (3L, 100L, 50L)))
  }

  test("bloom-gated substring dedup is row-identical to the ungated plan " +
      "(fixture and testdata)") {
    import spark.implicits._
    // the gate must be invisible: false positives die in the exact
    // equi-join, unique grams never reach the probe shuffle
    val c = (1 to 60).map(i => s"c$i").mkString(" ")
    val r = (1 to 50).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, c),
      (2L, s"p1 p2 p3 p4 p5 $c s1 s2 s3 s4 s5"),
      (3L, s"$r $r"))
      .toDF("doc_id", "text")
    assert(operators.Dedup.substringDedupBloom(docs, 50).collect().toSeq
      === operators.Dedup.substringDedup(docs, 50).collect().toSeq)
    val td = Tables.documents(spark, "/root/testdata/sf0.01")
    assert(operators.Dedup.substringDedupBloom(td, 50).collect().toSeq
      === operators.Dedup.substringDedup(td, 50).collect().toSeq)
  }

  test("substring dedup APPLY removes exactly the duplicated spans and " +
      "keeps first occurrences in place") {
    import spark.implicits._
    val c = (1 to 60).map(i => s"c$i").mkString(" ")
    val r = (1 to 50).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, c),                                   // owns C — untouched
      (2L, s"p1 p2 p3 p4 p5 $c s1 s2 s3 s4 s5"), // loses the C span
      (3L, s"$r $r"))                            // loses the repeat
      .toDF("doc_id", "text")
    val out = operators.Dedup.substringDedupApply(docs, 50)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 60L, c),
      (2L, 10L, "p1 p2 p3 p4 p5 s1 s2 s3 s4 s5"),
      (3L, 50L, r)))
  }

  test("substring APPLY is consistent with the detection counts on " +
      "testdata") {
    val docs = Tables.documents(spark, sf)
    val applied = operators.Dedup.substringDedupApply(docs, 50)
    val detected = operators.Dedup.substringDedup(docs, 50)
      .select(col("doc_id"), col("n_tok").as("d_ntok"), col("dup_tokens"))
    // docs whose every token is duplicated (whole-doc dupes of an earlier
    // doc) vanish from the cleaned corpus; everyone else appears with
    // kept == n_tok − dup_tokens (dup_tokens = 0 where undetected)
    val fullyCovered = detected
      .filter(col("dup_tokens") === col("d_ntok")).count()
    assert(applied.count() === docs.count() - fullyCovered)
    assert(fullyCovered > 0) // the fixture does contain whole-doc dupes
    val joined = applied.join(detected, Seq("doc_id"), "left")
      .withColumn("expect",
        col("n_tok") - coalesce(col("dup_tokens"), lit(0L)))
    assert(joined.filter(col("kept_tokens") =!= col("expect")).isEmpty)
  }

  test("substring dedup on testdata: spans are unioned, fractions bounded") {
    val out = operators.Dedup.substringDedup(
      Tables.documents(spark, sf), 50).cache()
    try {
      assert(out.count() > 0) // fixture has >=50-token duplicated runs
      // union length of w-token spans is >= w and <= the doc's tokens
      assert(out.filter(col("dup_tokens") < 50 ||
        col("dup_tokens") > col("n_tok")).isEmpty)
      assert(out.filter(col("dup_frac") > 1.0).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("segment dedup on testdata: unique docs pass through intact") {
    // sf0.001 has no duplicate texts, but segments CAN repeat across
    // docs; invariants rather than exact content: survivors keep >= 1
    // segment, and total kept segments == total distinct segments
    val docs = Tables.documents(spark, sf)
    val out = operators.Dedup.segmentDedup(docs, 16).cache()
    try {
      val kept = out.agg(sum("kept_segments")).collect()(0).getLong(0)
      val toks = split(trim(col("text")), "\\s+")
      val nSegs = ceil(size(toks).cast("double") / 16).cast("int")
      val distinctSegs = docs.select(posexplode(transform(
          sequence(lit(0), nSegs - 1),
          i => array_join(slice(toks, i * 16 + 1, lit(16)), " ")))
          .as(Seq("i", "seg")))
        .select("seg").distinct().count()
      assert(kept === distinctSegs)
      assert(out.filter(col("kept_segments") < 1).isEmpty)
    } finally out.unpersist()
  }

  test("docs with <2 tokens never pair (no NaN-Jaccard leakage)") {
    // Empty shingle sets make Jaccard 0/0 = NaN, and Spark orders NaN
    // above every double — without the token-count guard, `jac >= 0.8`
    // would emit every pair of short docs (and LSH would collide their
    // all-sentinel signatures in every bucket).
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, " "), (3L, "one"), (4L, "one"),
      (5L, "alpha beta gamma delta"), (6L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    for (pairs <- Seq(operators.Dedup.ngramJaccardPairs(docs),
        operators.Dedup.minhashPairs(docs))) {
      val got = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === Seq((5L, 6L, 1.0)), got.mkString(","))
    }
  }

  test("containment finds doc-in-doc pairs Jaccard misses, and the " +
      "prefix filter loses nothing vs a cross-join brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def words(n: Int, tag: String) =
      (0 until n).map(_ => s"$tag${rnd.nextInt(400)}").mkString(" ")
    val small = words(30, "w")
    // doc 1 is wholly pasted into doc 2 (20× longer): containment ≈ 1,
    // Jaccard ≈ 0.05 — invisible to the 0.8-Jaccard operators
    val docs = (Seq(
      (1L, small),
      (2L, words(300, "w") + " " + small + " " + words(300, "w")),
      (3L, words(40, "x")), (4L, words(35, "y"))) ++
      (5L to 30L).map(i => (i, words(20 + rnd.nextInt(80), s"t$i"))))
      .toDF("doc_id", "text")
    val got = operators.Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.9 },
      got.mkString(","))
    assert(!operators.Dedup.ngramJaccardPairs(docs).collect()
      .exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // brute force over every size-eligible pair on the same shingles
    val sh = operators.Dedup.shingleDocs(docs)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("n").as("n_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("n").as("n_b"))
    val inter = graft.functions.VectorFunctions
      .sortedIntersectCount(col("sh_a"), col("sh_b"))
    val brute = a.crossJoin(b)
      .filter((col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))) &&
        inter * 100 >= col("n_a") * 90)
      .select(col("doc_a"), col("doc_b"),
        round(inter.cast("double") / col("n_a"), 4).as("cont"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet === brute.toSet)
    assert(brute.nonEmpty)
  }

  test("df-capped containment: huge cap is exactly the uncapped join; " +
      "a tight cap routes only hot-prefix docs to overflow and " +
      "keeps every prunable-probe pair exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def words(n: Int, tag: String) =
      (0 until n).map(_ => s"$tag${rnd.nextInt(400)}").mkString(" ")
    val boiler = words(30, "b") // shared boilerplate: hot grams
    val docs = (Seq(
      (1L, words(30, "w")),
      (2L, words(300, "w") + " " + words(30, "w"))) ++
      // 12 PURE-boilerplate docs (identical text, distinct ids): every
      // shingle they own has df = 12, so their rarest gram is hot —
      // the exact-duplicate/template regime the df cap exists for
      (10L to 21L).map(i => (i, boiler)) ++
      (30L to 50L).map(i => (i, words(25 + rnd.nextInt(60), s"t$i"))))
      .toDF("doc_id", "text")
    val exact = operators.Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (pAll, oAll) =
      operators.Dedup.containmentPairsCapped(docs, 90, dfCap = 100000)
    assert(oAll.count() === 0L)
    assert(pAll.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      exact.toSet)
    val (pCap, oCap) =
      operators.Dedup.containmentPairsCapped(docs, 90, dfCap = 6)
    val over = oCap.collect().map(_.getLong(0)).toSet
    // only the boilerplate family's docs can overflow (their rarest
    // gram is shared by 12+ docs); the organic docs stay prunable
    assert(over.nonEmpty && over.forall(id => id >= 10L && id <= 21L),
      over.toString)
    // capped result = exact result restricted to prunable probe sides
    val expected = exact.filter { case (a, _, _) => !over.contains(a) }
    assert(pCap.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      expected.toSet)
  }

  test("df-capped containment: a doc with ONE rare gram but a hot " +
      "prefix tail overflows (the fan-out is governed by the hottest " +
      "prefix gram, not the rarest — ADVICE r9)") {
    import spark.implicits._
    // 12 copies of a 10-word boilerplate sentence → every boilerplate
    // gram has df 13 (12 copies + the probe doc). The probe doc is the
    // same sentence plus ONE unique lead word: its rarest gram has df 1,
    // but n = 10 distinct grams → prefix window n − ceil(.9n) + 1 = 2,
    // so the prefix holds the unique gram AND one df-13 boilerplate
    // gram. The r9 rarest-gram gate kept this doc on the probe side and
    // fanned out on the hot gram; the boundary-gram gate must overflow
    // it (and every pure-boilerplate doc).
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (Seq((1L, "unique " + boiler)) ++
      (10L to 21L).map(i => (i, boiler))).toDF("doc_id", "text")
    val (pairs, over) =
      operators.Dedup.containmentPairsCapped(docs, 90, dfCap = 6)
    val overIds = over.collect().map(_.getLong(0)).toSet
    assert(overIds.contains(1L), s"probe doc must overflow: $overIds")
    assert((10L to 21L).forall(overIds.contains), overIds.toString)
    assert(pairs.count() === 0L)
    // and the max_prefix_df column reports the BOUNDARY gram's df, not
    // the rarest: doc 1's rarest gram has df 1, boundary df 13
    val d1 = over.filter(col("doc_id") === 1L)
      .collect().head.getLong(1)
    assert(d1 === 13L)
  }

  test("hot-bucket cap bounds candidates on an all-identical corpus") {
    // Adversarial: m identical one-sentence docs collide into ONE bucket
    // per band. Uncapped that is m·(m−1)/2 candidate pairs (m=2000 →
    // ~2M rows × 8 bands before dedup); with the cap the bucket degrades
    // to star candidates, so the verified pair set is exactly the m−1
    // hub pairs (doc 0 ↔ every other doc, jac 1.0) — O(m), not O(m²).
    import spark.implicits._
    val m = 2000
    val docs = (0L until m.toLong)
      .map(i => (i, "the same boilerplate sentence appears in every doc"))
      .toDF("doc_id", "text")
    val pairs = operators.Dedup.minhashPairs(docs).collect()
    assert(pairs.length === m - 1, s"got ${pairs.length} pairs")
    assert(pairs.forall(r => r.getLong(0) === 0L && r.getDouble(2) === 1.0))
    // membership is preserved for clustering: one component, canonical 0
    val cc = operators.Dedup.connectedComponents(
      operators.Dedup.minhashPairs(docs)).collect()
    assert(cc.length === m && cc.forall(_.getLong(1) === 0L))
  }

  test("hot-bucket cap leaves normal-corpus results untouched") {
    // cap = MaxValue (never fires) must equal the default-capped result on
    // the fixture — the capped plan's extra bucket-stats join is a no-op
    // on data whose buckets are all narrow.
    val d = Tables.documents(spark, sf)
    val capped = operators.Dedup.minhashPairs(d).collect().toSeq
    val uncapped = operators.Dedup
      .minhashPairs(d, cap = Int.MaxValue).collect().toSeq
    assert(capped === uncapped)
  }

  test("brute-force jaccard values are within [0.8, 1]") {
    val jacs = operators.Dedup.qDedupNgramJaccard(spark, sf)
      .select("jac").collect().map(_.getDouble(0))
    assert(jacs.forall(j => j >= 0.8 && j <= 1.0))
  }

  test("simhash banding finds exactly the pairs a brute-force hamming scan finds") {
    import graft.functions.SketchFunctions.simhash64
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("hs", transform(col("toks"), t => xxhash64(t)))
      .select(col("doc_id"), simhash64(col("hs")).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (ida, idb)).toSet
    val banded = operators.Dedup.qDedupSimhash(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8×8-bit banding is complete for hamming <= 7 (pigeonhole), and the
    // exact bit_count verify removes false candidates → exact equality.
    assert(banded === brute)
    assert(brute.nonEmpty)
  }

  test("bucketed embedding near-dup recovers the brute-force pair set exactly") {
    // Triangle-inequality cluster-pair pruning is conservative, so the
    // bucketed plan is EXACT — full rows (ids + rounded sim) must match.
    val brute = operators.Similarity.qEmbedNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bucketed = operators.Similarity.qEmbedNearDupBucketed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed === brute)
    assert(brute.nonEmpty)
  }

  test("cosine top-k is ordered by similarity desc then vec_id") {
    val rows = operators.Similarity.qCosineTopk(spark, sf).collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
  }

  test("multi-probe IVF recall dominates single-probe") {
    val brute = operators.Similarity.qCosineTopk(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val p1 = operators.Similarity.qAnnIvf(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val p3 = operators.Similarity.qAnnMultiprobe(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(p3.size === 10)
    // probing 3 clusters can only widen the candidate pool
    assert((p3 intersect brute).size >= (p1 intersect brute).size)
  }

  test("IVF probe returns cluster-local top-k of the nearest k-means centroid") {
    val rows = operators.Similarity.qAnnIvf(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Int]("cluster")).distinct.length === 1)
    // deterministic across runs (fixed init + decimal means)
    val again = operators.Similarity.qAnnIvf(spark, sf).collect()
    assert(rows.toSeq === again.toSeq)
  }
}
