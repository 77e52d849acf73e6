package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The persisted BM25 postings index: raw (tf, dl) postings in a hive
  * layout by term-hash bucket plus an additive stats table, df/idf
  * computed at probe time — Lucene's segment discipline. Locks the
  * partition-pruned probe scan, row-identity with the in-memory batch
  * search, and exactness of incremental append (this is the on-disk
  * artifact backing the "a query batch reads its matched buckets, not
  * the whole postings table; new docs append without a rebuild" scale
  * claim — the text analog of IvfIndexSpec). */
class Bm25IndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("index probe is partition-pruned to the batch's matched buckets") {
    val dir = Files.createTempDirectory("graft_bm25").toString
    TextAnalysis.writeBm25Index(spark, sf, dir, nBuckets = 64)
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("bkt=")) > 1, dirs.mkString(","))
    // a deliberately tiny 2-term batch: pruning must be visible
    import spark.implicits._
    val qterms = Seq((1L, "the"), (2L, "data")).toDF("q_id", "tok")
    val probe = TextAnalysis.probeBm25Index(spark, dir, qterms,
      nBuckets = 64, topK = 5)
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse("")
    assert(pf.contains("bkt"), plan.take(900))
    // the term filter reaches parquet as a data filter too
    assert(plan.contains("PushedFilters") && plan.contains("tok"),
      plan.take(900))
    assert(probe.select("q_id").distinct().count() <= 2)
  }

  test("probing the persisted index equals the in-memory batch search") {
    // Same query batch, same scoring expression over the same integer
    // (tf, dl, df, N) inputs — the hive layout and the parquet
    // roundtrip cannot change results. This row-identity is why
    // q_bm25_index_probe shares q_bm25_search's oracle BY REFERENCE.
    val mem = TextAnalysis.qBm25Search(spark, sf)
      .collect().map(_.toSeq).toSeq
    val idx = TextAnalysis.qBm25IndexProbe(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(idx === mem)
  }

  test("append ≡ rebuild: an appended index answers like a full one") {
    // Build on the even doc_ids, append the odds; probe must equal both
    // the one-shot full rebuild AND the in-memory full-corpus search.
    // Exactness comes from the layout: postings carry only per-doc
    // facts (tf, dl), stats deltas are additive longs, df is
    // recomputed from the matched postings at probe time.
    val docs = Tables.documents(spark, sf)
    val dirInc = Files.createTempDirectory("graft_bm25_inc").toString
    val dirFull = Files.createTempDirectory("graft_bm25_full").toString
    TextAnalysis.writeBm25IndexOn(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0), dirInc)
    TextAnalysis.appendToBm25Index(spark, dirInc,
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
    TextAnalysis.writeBm25IndexOn(docs, dirFull)
    import spark.implicits._
    val qterms = Seq((1L, "the"), (2L, "data"), (3L, "spark"))
      .toDF("q_id", "tok")
    def rows(dir: String): Seq[Seq[Any]] =
      TextAnalysis.probeBm25Index(spark, dir, qterms)
        .collect().map(_.toSeq).toSeq
    assert(rows(dirInc) === rows(dirFull))
    // and the declared append key reproduces the declared search
    val mem = TextAnalysis.qBm25Search(spark, sf)
      .collect().map(_.toSeq).toSeq
    val app = TextAnalysis.qBm25IndexAppend(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(app === mem)
  }

  test("tombstone delete ≡ rebuild on the live docs; idempotent; " +
      "compaction reclaims postings without changing a row") {
    val docs = Tables.documents(spark, sf)
    val deleted = pmod(col("doc_id"), lit(10L)) === 9
    val dirDel = Files.createTempDirectory("graft_bm25_del").toString
    val dirLive = Files.createTempDirectory("graft_bm25_live").toString
    TextAnalysis.writeBm25IndexOn(docs, dirDel)
    TextAnalysis.deleteFromBm25Index(spark, dirDel,
      docs.filter(deleted).select("doc_id"))
    TextAnalysis.writeBm25IndexOn(docs.filter(!deleted), dirLive)
    import spark.implicits._
    val qterms = Seq((1L, "the"), (2L, "data"), (3L, "spark"))
      .toDF("q_id", "tok")
    def rows(dir: String): Seq[Seq[Any]] =
      TextAnalysis.probeBm25Index(spark, dir, qterms)
        .collect().map(_.toSeq).toSeq
    val afterDelete = rows(dirDel)
    assert(afterDelete === rows(dirLive),
      "deleted index must answer like a live-docs rebuild")
    // deleted docs never surface
    val delIds = docs.filter(deleted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterDelete.forall(r => !delIds.contains(
      r(2).asInstanceOf[Long])))
    // re-delivering the same delete batch is a no-op (dedup vs
    // existing tombstones — stats would double-subtract otherwise)
    TextAnalysis.deleteFromBm25Index(spark, dirDel,
      docs.filter(deleted).select("doc_id"))
    assert(rows(dirDel) === afterDelete)
    // compaction: tombstoned postings physically gone, tombstones dir
    // gone, one squashed stats row, answers unchanged
    val before = spark.read.parquet(s"$dirDel/postings").count()
    TextAnalysis.compactBm25Index(spark, dirDel)
    val after = spark.read.parquet(s"$dirDel/postings").count()
    assert(after < before, s"compaction must shrink postings: $after")
    assert(!new java.io.File(s"$dirDel/tombstones").exists())
    assert(spark.read.parquet(s"$dirDel/stats").count() === 1)
    assert(rows(dirDel) === afterDelete)
  }

  test("delete recovers dl from the dbkt-pruned sidecar — the job " +
      "reads ZERO postings files") {
    // The scale lock behind "deletion is a METADATA write": the
    // tombstone frame's dl recovery must never touch the term-hash
    // postings tree (a doc_id join there prunes nothing — it would be
    // a full-index scan per delete batch at 100 TB). The sidecar scan
    // itself must partition-prune to the batch's doc-hash buckets.
    val dir = Files.createTempDirectory("graft_bm25_sdel").toString
    TextAnalysis.writeBm25Index(spark, sf, dir, nBuckets = 64)
    val ids = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(3L, 17L)).select("doc_id")
    val tomb = TextAnalysis.bm25DeleteTombstones(spark, dir, ids, 64)
    val rows = tomb.collect()
    assert(rows.length === 2)
    val scans = collectFileScans(tomb.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val scanned = scans.flatMap(_.relation.location.rootPaths)
      .map(_.toString)
    assert(!scanned.exists(_.contains("/postings")),
      s"delete plan scans postings: ${scanned.mkString(", ")}")
    assert(scanned.exists(_.contains("/doclens")), scanned.mkString(","))
    // the sidecar read prunes to the 2-doc batch's dbkt directories
    val plan = tomb.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse("")
    assert(pf.contains("dbkt"), plan.take(900))
    // and the recovered dl is the true token count of each doc
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(3L, 17L))
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
  }

  test("compaction crash recovery: a root stranded at .prev rolls " +
      "back and the re-run compacts normally") {
    // Simulate a prior compaction that died between its two renames:
    // the index exists ONLY at `.prev`. The re-run's preamble must
    // roll it back and proceed — answers identical to an uninterrupted
    // delete+compact cycle.
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft_bm25_crash").toString
    val root = s"$dir/idx"
    TextAnalysis.writeBm25IndexOn(docs, root)
    TextAnalysis.deleteFromBm25Index(spark, root,
      docs.filter(pmod(col("doc_id"), lit(10L)) === 9).select("doc_id"))
    import spark.implicits._
    val qterms = Seq((1L, "the"), (2L, "data")).toDF("q_id", "tok")
    val want = TextAnalysis.probeBm25Index(spark, root, qterms)
      .collect().map(_.toSeq).toSeq
    // crash window: root retired to .prev, staging never published
    assert(new java.io.File(root)
      .renameTo(new java.io.File(root + ".prev")))
    TextAnalysis.compactBm25Index(spark, root)
    assert(new java.io.File(root).exists())
    assert(!new java.io.File(root + ".prev").exists())
    assert(!new java.io.File(s"$root/tombstones").exists())
    assert(TextAnalysis.probeBm25Index(spark, root, qterms)
      .collect().map(_.toSeq).toSeq === want)
  }

  test("ref-log publication: a reader pinned mid-rebuild keeps the old " +
    "version; new resolutions see the compacted one after the ref move") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_bm25_ref").toString + "/ix"
    val docs = Tables.documents(spark, sf)
    TextAnalysis.writeBm25IndexVersioned(spark, docs, root, nBuckets = 8)
    val pinned = TextAnalysis.servingBm25Root(spark, root)
    val qterms = Seq((1L, "the"), (2L, "data"), (3L, "spark"))
      .toDF("q_id", "tok")
    def probe(r: String): Seq[Seq[Any]] =
      TextAnalysis.probeBm25Index(spark, r, qterms)
        .collect().map(_.toSeq).toSeq
    // the serving version accrues a tombstone delete
    TextAnalysis.deleteFromBm25Index(spark, pinned,
      docs.filter(pmod(col("doc_id"), lit(5L)) === 0).select("doc_id"))
    val mutated = probe(pinned)
    // rebuild stages the COMPACTED next version; the ref is untouched
    val staged = TextAnalysis.stageBm25IndexVersion(spark, root)
    assert(staged === 2)
    assert(TextAnalysis.servingBm25Version(spark, root) === 1)
    assert(probe(pinned) === mutated,
      "staging disturbed the pinned serving version")
    // fast-forward: the new root answers identically to a fresh index
    // over the live docs, and the old version stays intact for its
    // pinned reader
    TextAnalysis.publishBm25IndexVersion(spark, root, staged)
    val newRoot = TextAnalysis.servingBm25Root(spark, root)
    assert(newRoot !== pinned)
    val dirLive = Files.createTempDirectory("graft_bm25_refl").toString
    TextAnalysis.writeBm25IndexOn(
      docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0), dirLive,
      nBuckets = 8)
    assert(probe(newRoot) === probe(dirLive),
      "published version diverged from a rebuild on the live docs")
    assert(probe(pinned) === mutated,
      "publication mutated the retired version")
  }

  test("streaming segments: probe across epochs ≡ one-shot index; " +
      "re-delivered segment replaces, not duplicates") {
    // Split the corpus in two "micro-batches", land each as an
    // epoch segment (the q_stream_bm25_ingest sink), probe across
    // both — must equal the one-shot index. Then re-deliver epoch 0
    // (the at-least-once retry) and require an unchanged answer.
    val docs = Tables.documents(spark, sf)
    val odd = pmod(col("doc_id"), lit(2L)) === 1
    val base = Files.createTempDirectory("graft_bm25_seg").toString
    val dirOne = Files.createTempDirectory("graft_bm25_one").toString
    graft.streaming.EventsStreaming
      .bm25IngestSegment(docs.filter(!odd), base, 0L)
    graft.streaming.EventsStreaming
      .bm25IngestSegment(docs.filter(odd), base, 1L)
    TextAnalysis.writeBm25IndexOn(docs, dirOne)
    import spark.implicits._
    val qterms = Seq((1L, "the"), (2L, "data")).toDF("q_id", "tok")
    def rows(dir: String): Seq[Seq[Any]] =
      TextAnalysis.probeBm25Index(spark, dir, qterms)
        .collect().map(_.toSeq).toSeq
    val segmented = rows(base)
    assert(segmented === rows(dirOne))
    graft.streaming.EventsStreaming
      .bm25IngestSegment(docs.filter(!odd), base, 0L)
    assert(rows(base) === segmented,
      "epoch re-delivery must replace the segment, not duplicate it")
  }
}
