package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline}

/** The end-to-end curation composition: dedup'd (exact AND near), quality
  * gated, deterministically split. */
class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("curated corpus is exact- and near-dup free, gated, and split") {
    import spark.implicits._
    // plant exact and near duplicates plus a junk doc on top of testdata
    val base = Tables.documents(spark, sf)
    val planted = base.limit(2).select("doc_id", "text").collect()
    val extra = Seq(
      (900001L, planted(0).getString(1)), // exact dup of an existing doc
      (900002L, planted(1).getString(1) + " extra"), // near dup
      (900003L, "xx")) // junk: fails the quality gate
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val docs = base.unionByName(extra)
    val curated = Pipeline.curateCorpus(docs, minQuality = 0.3)
    val out = curated.collect()
    // planted rows must all be gone: exact dup loses to the lower doc_id,
    // near dup collapses to its cluster canonical, junk fails the gate
    assert(!out.exists(_.getLong(0) >= 900001L))
    // no surviving near-dup pairs (brute-force check over the survivors)
    val survivors = docs.join(curated.select("doc_id"), "doc_id")
      .select("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(survivors).count() === 0)
    // quality gate respected
    assert(out.forall(_.getAs[Double]("quality") >= 0.3))
    // split: deterministic re-run, full coverage, roughly 80/10/10
    val again = Pipeline.curateCorpus(docs, minQuality = 0.3).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[String]("split"))).toSeq ===
      again.map(r => (r.getLong(0), r.getAs[String]("split"))).toSeq)
    val bySplit = out.groupBy(_.getAs[String]("split")).view
      .mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val trainFrac = bySplit.getOrElse("train", 0).toDouble / out.length
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train frac $trainFrac")

    // Shared-artifact path: restricting FULL-corpus pairs to the exact-dedup
    // survivors must produce the identical curated corpus as recomputing
    // pairs on the survivor subset (subset-closure of candidate generation
    // — the property qCorpusCurate's pair-table reuse relies on).
    val fullPairs =
      Dedup.minhashPairsWithStats(docs.select("doc_id", "text"))
    assert(fullPairs.nHotBuckets === 0L) // precondition of the reuse path
    val viaShared =
      Pipeline.curateCorpus(docs, minQuality = 0.3, Some(fullPairs))
        .collect()
    assert(viaShared.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("incremental curation equals full recuration restricted to the " +
      "new batch") {
    // the declared split: the top 20% of ids arrive as the new batch AFTER
    // the rest of the corpus was ingested — the increment must accept
    // exactly the new-id rows a full recuration of old ∪ new would accept,
    // including transitive rejections (a new doc connected to the seen
    // corpus only through a rejected batch-mate)
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") < 400L)
    val fresh = docs.filter(col("doc_id") >= 400L)
    val full = Pipeline.curateCorpus(docs, minQuality = 0.3)
      .filter(col("doc_id") >= 400L)
      .collect()
    val inc = Pipeline.curateIncrement(old, fresh, minQuality = 0.3)
      .collect()
    assert(inc.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)

    // the persisted-index path (the declared query's production shape)
    // must gate identically to the in-memory banded join
    val table = Dedup.writeLshIndex(
      old.select(col("doc_id"), col("text")), "pipelinespec_seen_idx")
    val viaIndex = Pipeline.curateIncrement(old, fresh, minQuality = 0.3,
      seenIndexTable = Some(table)).collect()
    assert(viaIndex.map(_.toSeq).toSeq === inc.map(_.toSeq).toSeq)
  }

  test("incremental curation gates: exact-of-seen, near-of-seen, " +
      "within-batch dup, junk") {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
    val seenRows = base.limit(2).select("doc_id", "text").collect()
    val extra = Seq(
      (900001L, seenRows(0).getString(1)), // exact dup of a seen doc
      (900002L, seenRows(1).getString(1) + " extra"), // near dup of seen
      (900003L, "xx"), // junk: fails the quality gate
      (900004L, seenRows(1).getString(1) + " extra"), // within-batch dup of 900002 (also near-seen)
      (900005L, ("fresh unique paragraph about entirely novel topics " * 6)
        .trim)) // genuinely new
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Pipeline.curateIncrement(base, extra, minQuality = 0.3)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(900005L), out.mkString(","))
  }

  test("cap-engaged pair table triggers the recompute fallback") {
    import spark.implicits._
    // >HotBucketCap docs sharing one boilerplate text: every LSH bucket
    // they land in is wider than the cap, so the full-corpus pair table is
    // star-degraded — the one regime where restricting it to a doc subset
    // diverges from recomputing on that subset (ADVICE r4). The curation
    // must detect nHotBuckets > 0 and recompute on the survivors.
    val boiler = "this exact boilerplate sentence repeats across the " +
      "corpus with no variation at all in any copy of the document"
    val m = Dedup.HotBucketCap + 36
    val docs = (1 to m).map(i => (i.toLong, boiler))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("dup"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val pt = Dedup.minhashPairsWithStats(docs.select("doc_id", "text"))
    assert(pt.nHotBuckets > 0L, "fixture must engage the hot-bucket cap")
    val viaShared =
      Pipeline.curateCorpus(docs, minQuality = 0.0, Some(pt)).collect()
    val recomputed =
      Pipeline.curateCorpus(docs, minQuality = 0.0, None).collect()
    assert(viaShared.map(_.toSeq).toSeq === recomputed.map(_.toSeq).toSeq)
    // all copies are exact dups of doc 1 — exact dedup alone collapses them,
    // so exactly one survivor regardless of which pair path ran
    assert(viaShared.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("leakage-free split never straddles a near-dup pair and covers " +
      "every doc exactly once") {
    val split = SparkEntry.queries("q_split_leakage_free")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(split.size.toLong === nDocs) // total function: one row per doc
    // the defining property: both ends of every verified near-dup pair
    // land in the SAME split (same canonical ⇒ same salted bucket)
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 === split(b)._1, s"pair ($a,$b) canonical differs")
      assert(split(a)._2 === split(b)._2, s"pair ($a,$b) split differs")
    }
    // all three splits materialize on the fixture
    assert(split.values.map(_._2).toSet === Set("train", "valid", "test"))
  }
}
