package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The persisted IVF index: hive layout by centroid id, partition-pruned
  * probes, and exactness when every partition is probed. This is the
  * on-disk artifact backing the "probe reads nprobe partitions, not the
  * corpus" scale claim. */
class IvfIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def queryVec: Array[Double] =
    Similarity.prepare(Tables.embeddings(spark, sf))
      .filter(col("vec_id") === 0L)
      .select("ce").head().getSeq[Double](0).toArray

  test("probe scan is partition-pruned to the probed centroid directories") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    Similarity.writeIvfIndex(Tables.embeddings(spark, sf), dir,
      k = 5, iters = 2)
    val dirs = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("c_id=")) === 5, dirs.mkString(","))
    val probe = Similarity.probeIvfIndex(spark, dir, queryVec,
      nprobe = 2, topK = 10)
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse("")
    assert(pf.contains("c_id"), plan.take(900))
    assert(probe.select("cluster").distinct().count() <= 2)
    assert(probe.count() === 10)
  }

  test("probing every partition recovers the exact brute-force top-k") {
    val dir = Files.createTempDirectory("graft_ivf_full").toString
    Similarity.writeIvfIndex(Tables.embeddings(spark, sf), dir,
      k = 5, iters = 2)
    // nprobe = k reads the whole (partitioned) corpus → must equal brute
    // force exactly; rank 1 is the query's own vector, dropped.
    val probed = Similarity.probeIvfIndex(spark, dir, queryVec,
      nprobe = 5, topK = 11)
      .filter(col("vec_id") =!= 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = Similarity.qCosineTopk(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed === brute)
  }

  test("incremental append assigns against frozen centroids; probe matches rebuild") {
    // Build the index on half the vectors, append the rest against the
    // FROZEN centroids, and require: (a) appended rows land in the same
    // partition the frozen-centroid assignment dictates (no new
    // directories, no reshuffle of old files); (b) an exhaustive probe of
    // the appended index equals an exhaustive probe of a one-shot rebuild
    // — both are the exact brute-force top-k, independent of which
    // centroids each index trained.
    val embs = Tables.embeddings(spark, sf)
    val dirInc = Files.createTempDirectory("graft_ivf_inc").toString
    val dirFull = Files.createTempDirectory("graft_ivf_fullr").toString
    val median = 250L
    Similarity.writeIvfIndex(embs.filter(col("vec_id") < median), dirInc,
      k = 5, iters = 2)
    val before = new java.io.File(s"$dirInc/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    Similarity.appendToIvfIndex(spark, dirInc,
      embs.filter(col("vec_id") >= median))
    val after = new java.io.File(s"$dirInc/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(after === before,
      s"append created partitions outside the frozen quantizer: $after")
    Similarity.writeIvfIndex(embs, dirFull, k = 5, iters = 2)
    def top(dir: String): Seq[Long] =
      Similarity.probeIvfIndex(spark, dir, queryVec, nprobe = 5, topK = 11)
        .filter(col("vec_id") =!= 0L)
        .collect().map(_.getLong(0)).toSeq
    val inc = top(dirInc)
    assert(inc === top(dirFull))
    assert(inc.toSet === Similarity.qCosineTopk(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("batch probe: prunes to the union of probed lists; probe-all " +
      "equals the in-memory batch brute force") {
    val embs = Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft_ivf_batch").toString
    Similarity.writeIvfIndex(embs, dir, k = 5, iters = 2)
    val qids = (1L to 4L)
    // nprobe=1: ≤4 probed lists of 5 — the scan must partition-prune
    val pruned = Similarity.probeIvfIndexBatch(spark, dir, qids,
      nprobe = 1, topK = 5)
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse("")
    assert(pf.contains("c_id"), plan.take(900))
    assert(pruned.select("q_id").distinct().count() === 4)
    // probe-all ≡ the in-memory batch brute force, rank for rank
    val all = Similarity.probeIvfIndexBatch(spark, dir, qids,
      nprobe = Int.MaxValue, topK = 5)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.cosineTopKBatch(embs, qids, 5)
      .collect().map(_.toSeq).toSeq
    assert(all === brute)
  }

  test("drift metric: a batch from the training distribution reproduces " +
    "the per-list baseline; a shifted batch inflates it") {
    val dir = Files.createTempDirectory("graft_ivf_drift").toString
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    Similarity.writeIvfIndex(embs, dir, k = 5, iters = 2)
    // cohort 1: the resident corpus itself — frozen-centroid assignment
    // is deterministic, so per-list quantiles reproduce EXACTLY and
    // every drift ratio is 1.0
    val baseline = Similarity.ivfDriftReport(spark, dir, embs).collect()
    assert(baseline.nonEmpty)
    baseline.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_train")) ===
        r.getLong(r.fieldIndex("n_batch")),
        s"baseline cohort lost vectors in list ${r.getInt(0)}")
      val ratio = r.getDouble(r.fieldIndex("drift_p95"))
      assert(math.abs(ratio - 1.0) < 1e-9,
        s"training-distribution drift must be 1.0, got $ratio")
    }
    // cohort 2: deterministic element-wise shift — every list's p95
    // assignment distance inflates, the rebuild trigger fires
    val shifted = embs.withColumn("embedding",
      transform(col("embedding"), x => x + lit(0.25f)))
    val drifted = Similarity.ivfDriftReport(spark, dir, shifted).collect()
    val ratios = drifted.filter(!_.isNullAt(drifted.head.fieldIndex(
      "drift_p95"))).map(_.getDouble(drifted.head.fieldIndex("drift_p95")))
    assert(ratios.nonEmpty && ratios.forall(_ > 1.0),
      s"shifted batch did not inflate drift: ${ratios.toSeq}")
  }

  test("ref-log publication: a reader pinned mid-rebuild keeps the old " +
    "version; the published retrain answers brute-force over the live " +
    "vectors and the retired version stays intact") {
    val root = Files.createTempDirectory("graft_ivf_ref").toString + "/ix"
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    Similarity.writeIvfIndexVersioned(spark, root, embs, k = 5, iters = 2)
    val pinned = Similarity.servingIvfRoot(spark, root) // resolved ONCE
    val qids = 1L to 4L
    def probe(r: String): Seq[Seq[Any]] =
      Similarity.probeIvfIndexBatch(spark, r, qids,
        nprobe = Int.MaxValue, topK = 5).collect().map(_.toSeq).toSeq
    // the serving version accrues mutations (append + tombstones)
    val shifted = embs
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.25f)))
    Similarity.appendToIvfIndex(spark, pinned, shifted)
    Similarity.deleteFromIvfIndex(spark, pinned,
      embs.filter(pmod(col("vec_id"), lit(10L)) === 9).select("vec_id"))
    val mutated = probe(pinned)
    // the rebuild STAGES v2 — the ref is untouched, so the pinned
    // reader AND any new resolution still read v1 (no swap window)
    val staged = Similarity.stageIvfIndexVersion(spark, root,
      k = 5, iters = 2)
    assert(staged === 2)
    assert(Similarity.servingIvfVersion(spark, root) === 1)
    assert(Similarity.servingIvfRoot(spark, root) === pinned)
    assert(probe(pinned) === mutated,
      "staging disturbed the pinned serving version")
    // fast-forward: probe-all over the published retrain ≡ brute force
    // over the live vectors; the retired version stays readable
    Similarity.publishIvfIndexVersion(spark, root, staged)
    val newRoot = Similarity.servingIvfRoot(spark, root)
    assert(newRoot !== pinned)
    val live = embs.filter(pmod(col("vec_id"), lit(10L)) =!= 9)
      .unionByName(shifted)
    val brute = Similarity.cosineTopKBatch(live, qids, 5)
      .collect().map(_.toSeq).toSeq
    assert(probe(newRoot) === brute,
      "published retrain diverged from brute force over live vectors")
    assert(probe(pinned) === mutated,
      "publication mutated the retired version")
  }

  test("drift report surfaces batch cohorts on zero-resident lists " +
    "(full-outer, not resident-keyed)") {
    val dir = Files.createTempDirectory("graft_ivf_drift0").toString
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    Similarity.writeIvfIndex(embs, dir, k = 5, iters = 2)
    // empty one list's residents (the deletes-then-compact shape that
    // leaves a centroid with no corpus rows) by dropping its partition
    val baseline = Similarity.ivfDriftReport(spark, dir, embs).collect()
    val victim = baseline.map(_.getInt(0)).max
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/corpus/c_id=$victim"),
      true)
    val rep = Similarity.ivfDriftReport(spark, dir, embs).collect()
    val row = rep.find(_.getInt(0) == victim).getOrElse(
      fail(s"zero-resident list $victim missing from drift report"))
    assert(row.getLong(row.fieldIndex("n_train")) === 0L,
      "emptied list must report n_train=0")
    assert(row.getLong(row.fieldIndex("n_batch")) > 0L,
      "batch cohort on the emptied list must be counted")
    assert(row.isNullAt(row.fieldIndex("drift_p95")),
      "no resident baseline => null drift ratio (trigger treats as fire)")
  }

  test("drift → rebuild loop: an ingested off-distribution batch " +
    "inflates drift, rebuildIvfIndex retrains and collapses it, " +
    "tombstones are reclaimed") {
    val dir = Files.createTempDirectory("graft_ivf_rbloop").toString + "/ix"
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    Similarity.writeIvfIndex(embs, dir, k = 5, iters = 2)
    val shifted = embs
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(0.25f)))
    def worstRatio(batch: org.apache.spark.sql.DataFrame): Double = {
      val rows = Similarity.ivfDriftReport(spark, dir, batch).collect()
      val i = rows.head.fieldIndex("drift_p95")
      rows.filter(!_.isNullAt(i)).map(_.getDouble(i)).max
    }
    val before = worstRatio(shifted)
    assert(before > 1.0, s"shifted batch should inflate drift: $before")
    // the gate fires: ingest the batch, tombstone a slice, rebuild
    Similarity.appendToIvfIndex(spark, dir, shifted)
    Similarity.deleteFromIvfIndex(spark, dir,
      embs.filter(pmod(col("vec_id"), lit(10L)) === 9).select("vec_id"))
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .select("centroid").collect().map(_.getSeq[Double](0)).toSet
    Similarity.rebuildIvfIndex(spark, dir, k = 5, iters = 2)
    // retrained: the centroid set actually moved, tombstones gone
    val centsAfter = spark.read.parquet(s"$dir/centroids")
      .select("centroid").collect().map(_.getSeq[Double](0)).toSet
    assert(centsAfter !== centsBefore, "rebuild did not retrain")
    assert(!new java.io.File(s"$dir/tombstones").exists(),
      "rebuild left tombstones behind")
    // the shifted cohort is now part of the training distribution:
    // its drift against the rebuilt index collapses
    val after = worstRatio(shifted)
    assert(after < before,
      s"rebuild did not reduce drift: $before -> $after")
    assert(after <= 1.05,
      s"post-rebuild drift of an in-distribution batch: $after")
    // and the rebuilt index is still exactly the live corpus
    val live = embs.filter(pmod(col("vec_id"), lit(10L)) =!= 9)
      .count() + shifted.count()
    assert(spark.read.parquet(s"$dir/corpus").count() === live)
  }

  test("tombstone delete ≡ rebuild on live vectors; compaction " +
      "reclaims without changing a row") {
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    val deleted = pmod(col("vec_id"), lit(10L)) === 9
    val dirDel = Files.createTempDirectory("graft_ivf_del").toString
    val dirLive = Files.createTempDirectory("graft_ivf_lv").toString
    Similarity.writeIvfIndex(embs, dirDel, k = 5, iters = 2)
    Similarity.deleteFromIvfIndex(spark, dirDel,
      embs.filter(deleted).select("vec_id"))
    // a second index on the same input trains identical (deterministic)
    // centroids; delete + compact it to compare the full lifecycle
    Similarity.writeIvfIndex(embs, dirLive, k = 5, iters = 2)
    Similarity.deleteFromIvfIndex(spark, dirLive,
      embs.filter(deleted).select("vec_id"))
    Similarity.compactIvfIndex(spark, dirLive)
    def top(dir: String): Seq[(Long, Double)] =
      Similarity.probeIvfIndex(spark, dir, queryVec,
        nprobe = 5, topK = 10)
        .select("vec_id", "sim").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val afterDelete = top(dirDel)
    // no deleted id surfaces, and re-delivery is a no-op
    val delIds = embs.filter(deleted)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(afterDelete.forall(p => !delIds.contains(p._1)))
    Similarity.deleteFromIvfIndex(spark, dirDel,
      embs.filter(deleted).select("vec_id"))
    assert(top(dirDel) === afterDelete)
    // compaction: physically smaller corpus, tombstones gone, same rows
    val before = spark.read.parquet(s"$dirDel/corpus").count()
    Similarity.compactIvfIndex(spark, dirDel)
    assert(spark.read.parquet(s"$dirDel/corpus").count() < before)
    assert(!new java.io.File(s"$dirDel/tombstones").exists())
    assert(top(dirDel) === afterDelete)
    // and both equal the compacted live index (same frozen centroids)
    assert(top(dirLive) === afterDelete)
  }

  test("compaction crash recovery: a root stranded at .prev rolls " +
      "back and the re-run compacts normally") {
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L)
    val dir = Files.createTempDirectory("graft_ivf_crash").toString
    val root = s"$dir/idx"
    Similarity.writeIvfIndex(embs, root, k = 5, iters = 2)
    Similarity.deleteFromIvfIndex(spark, root,
      embs.filter(pmod(col("vec_id"), lit(10L)) === 9).select("vec_id"))
    def top(): Seq[(Long, Double)] =
      Similarity.probeIvfIndex(spark, root, queryVec,
        nprobe = 5, topK = 10)
        .select("vec_id", "sim").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = top()
    // crash window: root retired to .prev, staging never published
    assert(new java.io.File(root)
      .renameTo(new java.io.File(root + ".prev")))
    Similarity.compactIvfIndex(spark, root)
    assert(new java.io.File(root).exists())
    assert(!new java.io.File(root + ".prev").exists())
    assert(!new java.io.File(s"$root/tombstones").exists())
    assert(top() === want)
  }

  test("streaming segments: frozen-centroid epochs probe like the " +
      "canonical layout; re-delivery replaces; compact merges segments") {
    // The vector analogue of the BM25 segment test: centroids trained
    // once on a deterministic sample and frozen, the corpus arriving as
    // two epoch segments, probed as ONE index ≡ the canonical
    // appendToIvfIndex layout over the same centroids. Re-delivering
    // epoch 0 (the at-least-once retry) must replace, not duplicate;
    // compaction must merge the epoch tree into the canonical c_id
    // layout without changing a row.
    val embs = Tables.embeddings(spark, sf)
    val base = Files.createTempDirectory("graft_ivf_seg").toString
    val twin = Files.createTempDirectory("graft_ivf_segtw").toString
    val sampled = pmod(col("vec_id"), lit(2L)) === 0
    Similarity.writeIvfCentroids(embs.filter(sampled), base,
      k = 5, iters = 2)
    spark.read.parquet(s"$base/centroids")
      .write.parquet(s"$twin/centroids")
    val half = pmod(col("vec_id"), lit(3L)) === 0
    Similarity.ivfIngestSegment(spark, base, embs.filter(half), 0L)
    Similarity.ivfIngestSegment(spark, base, embs.filter(!half), 1L)
    Similarity.appendToIvfIndex(spark, twin, embs)
    def rows(dir: String): Seq[Seq[Any]] =
      Similarity.probeIvfIndexBatch(spark, dir, (1L to 4L),
        nprobe = Int.MaxValue, topK = 5).collect().map(_.toSeq).toSeq
    val segmented = rows(base)
    assert(segmented === rows(twin),
      "epoch segments must answer like the canonical layout")
    Similarity.ivfIngestSegment(spark, base, embs.filter(half), 0L)
    assert(rows(base) === segmented,
      "epoch re-delivery must replace the segment, not duplicate it")
    Similarity.compactIvfIndex(spark, base)
    val dirs = new java.io.File(s"$base/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("c_id=")),
      s"compact left segment dirs: ${dirs.mkString(",")}")
    assert(rows(base) === segmented)
  }
}
