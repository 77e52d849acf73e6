package graft

import org.apache.spark.sql.functions._

import graft.operators.Lakehouse

/** Locks the versioned-table METADATA claims the DuckDB oracle cannot see:
  * a delete commit leaves every data entry byte-identical (merge-on-read,
  * no rewrite), the CDC read scans only the files its commits added, the
  * snapshot read scans exactly the manifest's file set (never a directory
  * listing), commits are idempotent, and a crash that strands a staging
  * manifest recovers on re-drive. The VALUES of every version are gated by
  * the driver oracle (q_table_time_travel / _snapshot_rows / _cdc). */
class LakehouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshRoot(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_lh_$tag").toString + "/t"
    Lakehouse.buildVersionedOrders(spark, sf, root)
    root
  }

  test("delete commit is metadata: v3 data entries identical to v2, " +
    "plus exactly the delete files") {
    val root = freshRoot("meta")
    val v2 = Lakehouse.manifestEntries(spark, root, 2)
    val v3 = Lakehouse.manifestEntries(spark, root, 3)
    assert(v2.forall(_._1 == "data"))
    assert(v3.filter(_._1 == "data") === v2,
      "delete rewrote or dropped a data file")
    val dels = v3.filter(_._1 == "delete")
    assert(dels.nonEmpty && dels.forall(_._2.startsWith("deletes/w=3")))
    // and the delete files hold one key per deleted record, nothing else
    val delKeys = spark.read.parquet(dels.map(e => s"$root/${e._2}"): _*)
    assert(delKeys.columns.toSeq === Seq("o_orderkey"))
    val expected = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(3)) =!= 2 &&
        pmod(col("o_orderkey"), lit(10)) === 4).count()
    assert(delKeys.count() === expected)
  }

  test("time travel: every version reproduces its predicate state and " +
    "stays stable after later commits") {
    val root = freshRoot("tt")
    val orders = Tables.orders(spark, sf)
    def n(v: Int) = Lakehouse.readVersion(spark, root, v, "o_orderkey").count()
    val base = orders.filter(pmod(col("o_orderkey"), lit(3)) === 0).count()
    val app = orders.filter(pmod(col("o_orderkey"), lit(3)) === 1).count()
    val dead = orders.filter(pmod(col("o_orderkey"), lit(3)) =!= 2 &&
      pmod(col("o_orderkey"), lit(10)) === 4).count()
    assert(n(1) === base)
    assert(n(2) === base + app)
    assert(n(3) === base + app - dead)
    assert(n(4) === base + app - dead)
    assert(Lakehouse.latestVersion(spark, root) === 6)
    // v4's compaction dropped the merge-on-read debt: no delete entries
    assert(Lakehouse.manifestEntries(spark, root, 4).forall(_._1 == "data"))
    // v5's upsert: +inserted third, updated keys resolve to fresh rows
    val ins = orders.filter(pmod(col("o_orderkey"), lit(3)) === 2).count()
    assert(n(5) === base + app - dead + ins)
    val updated = Lakehouse.readVersion(spark, root, 5, "o_orderkey")
      .filter(pmod(col("o_orderkey"), lit(3)) =!= 2 &&
        pmod(col("o_orderkey"), lit(7)) === 0)
    val origSum = orders
      .filter(pmod(col("o_orderkey"), lit(3)) =!= 2 &&
        pmod(col("o_orderkey"), lit(10)) =!= 4 &&
        pmod(col("o_orderkey"), lit(7)) === 0)
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    val newSum = updated.agg(sum(col("o_totalprice"))).head().getDouble(0)
    val nUpd = updated.count()
    // every updated row carries exactly the +10 (sequence scoping: the
    // merge's delete masked the OLD rows, never the fresh ones)
    assert(math.abs(newSum - origSum - 10.0 * nUpd) < 1e-6,
      s"updated sum $newSum vs orig $origSum over $nUpd rows")
    // schema evolution is versioned too: v5 predates o_channel (absent
    // from its read), v6 surfaces it — null exactly on pre-evolution
    // rows, populated exactly on the evolved batch
    assert(!Lakehouse.readVersion(spark, root, 5, "o_orderkey")
      .columns.contains("o_channel"))
    val v6 = Lakehouse.readVersion(spark, root, 6, "o_orderkey")
    assert(v6.columns.contains("o_channel"))
    val evolved = orders
      .filter(pmod(col("o_orderkey"), lit(97)) === 5).count()
    assert(v6.filter(col("o_channel").isNotNull).count() === evolved)
    assert(v6.filter(col("o_channel").isNull).count() === n(5))
  }

  test("commit metadata is O(delta): snapshots reuse inherited manifests " +
    "by name, a commit's own manifest holds only its added entries, and " +
    "compaction resets the manifest count") {
    val root = freshRoot("delta")
    def list(v: Int) = Lakehouse.snapshotManifests(spark, root, v)
    // append: v2's list = v1's manifests (byte-identical names — nothing
    // inherited is rewritten) + exactly one new manifest
    assert(list(1).size === 1)
    assert(list(2).toSet.intersect(list(1).toSet) === list(1).toSet,
      "append rewrote an inherited manifest")
    assert(list(2).size === list(1).size + 1)
    val added2 = Lakehouse.readManifests(spark, root,
      (list(2).toSet -- list(1).toSet).toSeq)
    assert(added2.nonEmpty && added2.forall { case (k, p, q) =>
      k == "data" && p.startsWith("data/w=2") && q == 2 },
      "the append's own manifest carries more than its added files")
    // delete commit: one new manifest, delete entries ONLY — the
    // single-level scheme would re-list every data file here
    assert(list(3).size === list(2).size + 1)
    val added3 = Lakehouse.readManifests(spark, root,
      (list(3).toSet -- list(2).toSet).toSeq)
    assert(added3.nonEmpty && added3.forall { case (k, p, _) =>
      k == "delete" && p.startsWith("deletes/w=3") },
      "the delete commit's manifest re-listed data entries")
    // compaction is the rewrite: exactly one fresh manifest, rent reset
    assert(list(4).size === 1)
    assert(!list(3).contains(list(4).head))
    // the evolved append's metadata delta is strictly smaller than the
    // live file set it would have re-listed under a single-level scheme
    val v5Entries = Lakehouse.manifestEntries(spark, root, 5).size
    val added6 = Lakehouse.readManifests(spark, root,
      (list(6).toSet -- list(5).toSet).toSeq).size
    assert(added6 < v5Entries,
      s"commit 6 wrote $added6 manifest rows, not less than the " +
        s"$v5Entries a full re-list would")
  }

  test("manifest merge is metadata-only: entries identical behind one " +
    "manifest, no data file touched, replay idempotent") {
    val root = freshRoot("mm")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$root/data"), true)
      val b = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next(); b += f.getPath.toUri.getPath -> f.getModificationTime
      }
      b.toMap
    }
    val filesBefore = dataFiles()
    val before = Lakehouse.manifestEntries(spark, root, 6)
    assert(Lakehouse.snapshotManifests(spark, root, 6).size > 1)
    val v = Lakehouse.mergeManifests(spark, root, 6)
    assert(v === 7)
    assert(Lakehouse.manifestEntries(spark, root, 7) === before,
      "manifest merge changed the referenced file set")
    assert(Lakehouse.snapshotManifests(spark, root, 7).size === 1)
    assert(dataFiles() === filesBefore, "manifest merge touched data")
    // replay: same entries → read-back no-op, no duplicate manifest
    val mDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/_manifests")).length
    Lakehouse.mergeManifests(spark, root, 6)
    assert(Lakehouse.manifestEntries(spark, root, 7) === before)
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/_manifests")).length === mDirs,
      "manifest-merge replay left garbage metadata")
  }

  test("refs: the log orders updates, a stranded ref staging is " +
    "invisible, and a failed audit never moves the ref") {
    val root = freshRoot("refs")
    Lakehouse.setRef(spark, root, "main", 3)
    Lakehouse.setRef(spark, root, "main", 2) // rollback
    Lakehouse.setRef(spark, root, "main", 6)
    assert(Lakehouse.refLog(spark, root, "main").map(_._2) === Seq(3, 2, 6))
    assert(Lakehouse.getRef(spark, root, "main") === 6)
    // strand a staging write (crash before rename): invisible to the log
    import spark.implicits._
    Seq(99).toDF("version").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/_refs/main/.r=4.staging.dead")
    assert(Lakehouse.getRef(spark, root, "main") === 6)
    Lakehouse.setRef(spark, root, "main", 4)
    assert(Lakehouse.refLog(spark, root, "main").map(_._2) ===
      Seq(3, 2, 6, 4))
    // audit gate: v3 has merge-on-read deletes but clean keys → passes;
    // a version staged with duplicate keys must be refused
    assert(Lakehouse.auditAndPublish(spark, root, 3, "aud", "o_orderkey"))
    assert(Lakehouse.getRef(spark, root, "aud") === 3)
    val dup = Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .limit(10)
    dup.unionAll(dup).repartition(1, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$root/data/w=dup")
    Lakehouse.commitVersion(spark, root, 9,
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=dup")
        .map(("data", _, 9)))
    assert(!Lakehouse.auditAndPublish(spark, root, 9, "aud", "o_orderkey"),
      "duplicate keys passed the audit")
    assert(Lakehouse.getRef(spark, root, "aud") === 3,
      "a failed audit moved the ref")
  }

  test("snapshot read scans exactly the manifest file set; CDC reads " +
    "only the added files") {
    val root = freshRoot("scan")
    val v3 = Lakehouse.readVersion(spark, root, 3, "o_orderkey")
    val scanned = collectFileScans(v3.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).map(p =>
        new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val manifest = Lakehouse.manifestEntries(spark, root, 3)
      .map(e => new org.apache.hadoop.fs.Path(s"$root/${e._2}")
        .toUri.getPath).toSet
    assert(scanned === manifest,
      "read consulted files outside the committed manifest")
    // CDC v1→v2: every scanned file lives under the appended write only
    val (ins, dels) = Lakehouse.changedFiles(spark, root, 1, 2)
    assert(dels.isEmpty)
    assert(ins.nonEmpty && ins.forall(_.contains("/data/w=2/")),
      "CDC resolved files outside the appended commit")
    val expected = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(3)) === 1).count()
    assert(spark.read.parquet(ins: _*).count() === expected)
  }

  test("streaming ingestCommit is transaction-log exactly-once: a " +
    "re-delivered epoch does no work and strands no manifest reference") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_txn").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val b0 = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
    val b1 = orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
    Lakehouse.ingestCommit(root, b0, 0L, "o_orderkey")
    Lakehouse.ingestCommit(root, b1, 1L, "o_orderkey")
    val before = Lakehouse.manifestEntries(spark, root, 2)
    val n = Lakehouse.readVersion(spark, root, 2, "o_orderkey").count()
    assert(n === orders.count())
    // re-deliver epoch 0 (the at-least-once retry): the committed
    // manifest's file names must survive — the data directory is not
    // rewritten, the manifest chain is unchanged, every referenced
    // file still exists
    Lakehouse.ingestCommit(root, b0, 0L, "o_orderkey")
    assert(Lakehouse.manifestEntries(spark, root, 2) === before)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    before.foreach { case (_, p, _) =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$p")),
        s"re-delivery stranded manifest reference $p")
    }
    assert(Lakehouse.readVersion(spark, root, 2, "o_orderkey")
      .count() === n)
    // version 1 (epoch 0 alone) stays readable mid-history
    assert(Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .count() === b0.count())
    // and the delete→compact commits compose on top
    val v3 = Lakehouse.deleteCommit(spark, root, 2,
      b0.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select("o_orderkey"))
    val v4 = Lakehouse.compactCommit(spark, root, v3, "o_orderkey")
    val dead = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0 &&
      pmod(col("o_orderkey"), lit(10)) === 0).count()
    assert(Lakehouse.readVersion(spark, root, v4, "o_orderkey")
      .count() === n - dead)
    // driver-side commits are NOT replayable: re-driving the delete
    // against its committed version must fail BEFORE touching the
    // delete dir (an overwrite would strand the published manifest's
    // file references), and the committed read stays intact. The dir
    // is per-attempt (UUID-suffixed) — resolve it from the manifest.
    val delRel = Lakehouse.manifestEntries(spark, root, v3)
      .collectFirst { case ("delete", p, _) => p }.get
    val delDir = new org.apache.hadoop.fs.Path(s"$root/$delRel").getParent
    val mtimeBefore = fs.listStatus(delDir).map(_.getModificationTime).toSeq
    intercept[IllegalArgumentException] {
      Lakehouse.deleteCommit(spark, root, 2,
        b0.limit(3).select("o_orderkey"))
    }
    assert(fs.listStatus(delDir).map(_.getModificationTime).toSeq ===
      mtimeBefore, "failed replay still rewrote the committed delete dir")
    assert(Lakehouse.readVersion(spark, root, v3, "o_orderkey")
      .count() === n - dead)
  }

  test("streaming merge commits are exactly-once: a re-delivered upsert " +
    "epoch does no work, intermediate versions stay readable") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_cdc").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val base = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
    val upsert = orders.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .unionAll(orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .limit(50))
    Lakehouse.ingestCommit(root, base, 0L, "o_orderkey")
    Lakehouse.mergeIngestCommit(root, upsert, 1L, "o_orderkey")
    val before = Lakehouse.manifestEntries(spark, root, 2)
    val n2 = Lakehouse.readVersion(spark, root, 2, "o_orderkey").count()
    assert(n2 === base.count() + 50)
    // re-delivery: no entry changes, every referenced file survives
    Lakehouse.mergeIngestCommit(root, upsert, 1L, "o_orderkey")
    assert(Lakehouse.manifestEntries(spark, root, 2) === before)
    // sequence scoping: every matched key resolves to its FRESH row
    val updSum = Lakehouse.readVersion(spark, root, 2, "o_orderkey")
      .filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .agg(sum("o_totalprice")).head().getDouble(0)
    val origSum = orders.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .agg(sum("o_totalprice")).head().getDouble(0)
    val nUpd = orders.filter(pmod(col("o_orderkey"), lit(4)) === 0).count()
    assert(math.abs(updSum - origSum - nUpd) < 1e-6)
    // the pre-merge version is untouched history
    assert(Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .count() === base.count())
  }

  test("vacuum reclaims exactly the unreferenced files: retained reads " +
    "survive, pre-horizon versions are gone, nothing referenced is lost") {
    val root = freshRoot("vac")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def live(sub: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
      if (!fs.exists(p)) Set.empty
      else {
        val it = fs.listFiles(p, true)
        val b = scala.collection.mutable.Set.empty[String]
        while (it.hasNext) {
          val n = it.next().getPath
          if (!n.getName.startsWith("_") && !n.getName.startsWith("."))
            b += n.toUri.getPath
        }
        b.toSet
      }
    }
    val before = live("data") ++ live("deletes")
    val retained = Seq(4, 5, 6)
      .flatMap(v => Lakehouse.manifestEntries(spark, root, v))
      .map(e => new org.apache.hadoop.fs.Path(s"$root/${e._2}")
        .toUri.getPath).toSet
    val expectGone = before -- retained
    val n4 = Lakehouse.readVersion(spark, root, 4, "o_orderkey").count()
    // the default one-hour orphan grace treats EVERY fresh unreferenced
    // file as a possibly-in-flight commit: on this seconds-old history
    // a default vacuum must reclaim nothing (the concurrent-writer
    // guard), and the stranded-manifest shape it protects survives too
    import spark.implicits._
    Seq(("data", "data/w=inflight/x.parquet", 99)).toDF("k", "p", "s")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/_manifests/m=99-inflight")
    assert(Lakehouse.vacuum(spark, root, retainFrom = 4) === 0,
      "default-grace vacuum reclaimed a fresh (possibly in-flight) file")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m=99-inflight")),
      "default-grace vacuum deleted a fresh unreferenced manifest — " +
        "the concurrent-writer stage-then-publish window")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m=99-inflight"), true)
    // graceMs=0 is the single-writer maintenance window: reclaim now
    val reclaimed = Lakehouse.vacuum(spark, root, retainFrom = 4,
      graceMs = 0L)
    assert(reclaimed === expectGone.size,
      s"reclaimed $reclaimed != unreferenced ${expectGone.size}")
    val after = live("data") ++ live("deletes")
    assert(after === retained,
      "vacuum left garbage or deleted a referenced file")
    // the retained read is byte-equal in cardinality and still scans
    assert(Lakehouse.readVersion(spark, root, 4, "o_orderkey")
      .count() === n4)
    // a pre-horizon version is genuinely unreadable now (its files are
    // gone) — the documented retention trade
    val v1Read = scala.util.Try(
      Lakehouse.readVersion(spark, root, 1, "o_orderkey").count())
    assert(v1Read.isFailure || v1Read.get < n4,
      "vacuum claimed to reclaim v1's files but v1 still reads whole")
  }

  test("zone-map file skipping: the pruned range read scans strictly " +
    "fewer files than the version references and loses no rows") {
    val root = freshRoot("prune")
    val v3Data = Lakehouse.manifestEntries(spark, root, 3)
      .count(_._1 == "data")
    val pruned = Lakehouse.readVersionPruned(spark, root, 3,
      "o_orderkey", 100L, 399L)
    pruned.collect()
    val scanned = collectFileScans(pruned.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles)
      .filterNot(_.contains("/deletes/")).toSet
    assert(scanned.nonEmpty && scanned.size < v3Data,
      s"no skipping: scanned ${scanned.size} of $v3Data data files")
    // and the pruned read is exactly the filtered unpruned read
    val expect = Lakehouse.readVersion(spark, root, 3, "o_orderkey")
      .filter(col("o_orderkey").between(100L, 399L))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = pruned.select("o_orderkey").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq === expect.toSeq)
  }

  test("z-order + multi-column zone maps: the 2-D range read prunes " +
    "strictly more files than either single dimension alone and loses " +
    "no rows") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_z").toString + "/t"
    Lakehouse.buildZorderDemo(spark, sf, root)
    val nData = Lakehouse.manifestEntries(spark, root, 1).size
    assert(nData === 16)
    def scannedData(df: org.apache.spark.sql.DataFrame): Set[String] = {
      df.collect()
      collectFileScans(df.queryExecution.executedPlan)
        .flatMap(_.relation.location.inputFiles)
        .filterNot(_.contains("/deletes/")).toSet
    }
    // quarter-boxes of the sf0.001 key spaces (o_orderkey ≤ 1499,
    // o_custkey ≤ 149) — each dimension alone keeps its low-range
    // files; the conjunction keeps only the low-low corner
    val kPred = ("o_orderkey", 0L, 370L)
    val cPred = ("o_custkey", 0L, 36L)
    val both = scannedData(Lakehouse.readVersionPrunedCols(
      spark, root, 1, "o_orderkey", Seq(kPred, cPred)))
    val kOnly = scannedData(Lakehouse.readVersionPrunedCols(
      spark, root, 1, "o_orderkey", Seq(kPred)))
    val cOnly = scannedData(Lakehouse.readVersionPrunedCols(
      spark, root, 1, "o_orderkey", Seq(cPred)))
    // z-order bounds BOTH dimensions per file: each single-dimension
    // prune already skips, and the conjunction prunes beyond either
    assert(kOnly.size < nData && cOnly.size < nData,
      s"z-order failed to bound a dimension: k=${kOnly.size} " +
        s"c=${cOnly.size} of $nData")
    assert(both.size < kOnly.size && both.size < cOnly.size,
      s"2-D pruning (${both.size}) not stricter than 1-D " +
        s"(${kOnly.size}/${cOnly.size})")
    assert(both.subsetOf(kOnly) && both.subsetOf(cOnly))
    // and the pruned read is exactly the filtered full read
    val expect = Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .filter(col("o_orderkey").between(0L, 370L) &&
        col("o_custkey").between(0L, 36L))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = Lakehouse.readVersionPrunedCols(
      spark, root, 1, "o_orderkey", Seq(kPred, cPred))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expect.toSeq)
    // a predicate on a column WITHOUT recorded stats prunes nothing
    // (conservative keep) but still filters exactly — the contract
    // that makes adding a stats column an optimization, never a
    // correctness knob
    val noStats = Lakehouse.readVersionPrunedCols(
      spark, root, 1, "o_orderkey",
      Seq(("o_totalprice", 0L, 100000L)))
    noStats.collect()
    val noStatsScanned = collectFileScans(
      noStats.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).toSet
    assert(noStatsScanned.size === nData,
      "a stats-less column wrongly pruned files")
    assert(noStats.count() ===
      Lakehouse.readVersion(spark, root, 1, "o_orderkey")
        .filter(col("o_totalprice").between(0L, 100000L)).count())
  }

  test("partition transforms: the date-range read scans only files " +
    "whose path-recorded partition value intersects under ITS OWN " +
    "spec, across the month→day evolution, composed with deletes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_part").toString + "/t"
    Lakehouse.buildPartitionedDemo(spark, sf, root)
    val allData = Lakehouse.manifestEntries(spark, root, 3)
      .collect { case ("data", p, _) => p }
    assert(allData.exists(_.contains("/ps=1/")) &&
      allData.exists(_.contains("/ps=2/")),
      "demo table must carry both partition specs")
    def scanned(df: org.apache.spark.sql.DataFrame): Set[String] = {
      df.collect()
      collectFileScans(df.queryExecution.executedPlan)
        .flatMap(_.relation.location.inputFiles)
        .filterNot(_.contains("/deletes/")).toSet
    }
    val pv = "pv=([^/]+)/".r
    def pvs(files: Set[String], spec: Int): Set[String] =
      files.filter(_.contains(s"/ps=$spec/"))
        .flatMap(f => pv.findFirstMatchIn(f).map(_.group(1)))
    // a range inside one month: the month spec keeps exactly that
    // month's file; the day spec keeps only the in-range days
    val narrow = Lakehouse.readVersionPartitionPruned(spark, root, 3,
      "o_orderkey", "o_orderdate", "1995-03-05", "1995-03-10")
    val nScan = scanned(narrow)
    assert(nScan.size < allData.size,
      s"no partition skipping: ${nScan.size} of ${allData.size}")
    assert(pvs(nScan, 1) === Set("1995-03"),
      s"month-spec survivors wrong: ${pvs(nScan, 1)}")
    assert(pvs(nScan, 2).nonEmpty && pvs(nScan, 2).forall(d =>
      d >= "1995-03-05" && d <= "1995-03-10"),
      s"day-spec survivors outside range: ${pvs(nScan, 2)}")
    // exact rows: pruned ≡ plain predicate over the snapshot (delete
    // mask applied in both)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val expect = Lakehouse.readVersion(spark, root, 3, "o_orderkey")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd")
        .between("1995-03-05", "1995-03-10"))
    assert(rows(narrow) === rows(expect))
    // time travel composes: the pruned read of v1 (month spec only)
    // equals the filtered v1 state
    val v1Pruned = Lakehouse.readVersionPartitionPruned(spark, root, 1,
      "o_orderkey", "o_orderdate", "1995-03-05", "1995-03-10")
    val v1Expect = Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd")
        .between("1995-03-05", "1995-03-10"))
    assert(rows(v1Pruned) === rows(v1Expect))
    assert(pvs(scanned(v1Pruned), 2).isEmpty,
      "v1 predates the day-spec commit but scanned its files")
    // CDC composes: the v1→v2 change slice is exactly the day-spec
    // commit's files
    val (ins2, del2) = Lakehouse.changedFiles(spark, root, 1, 2)
    assert(del2.isEmpty)
    assert(ins2.nonEmpty && ins2.forall(_.contains("/ps=2/")),
      s"v2 change slice is not the day-spec files: ${ins2.take(3)}")
    // a range covering the whole history prunes nothing — every file's
    // value intersects, the read degrades to the plain snapshot scan
    val wide = Lakehouse.readVersionPartitionPruned(spark, root, 3,
      "o_orderkey", "o_orderdate", "1900-01-01", "2099-12-31")
    assert(scanned(wide).size === allData.size,
      "an all-covering range wrongly pruned files")
    assert(rows(wide) ===
      rows(Lakehouse.readVersion(spark, root, 3, "o_orderkey")))
  }

  test("all-null stats column falls to conservative-keep (no null " +
    "unbox) and vacuum sweeps superseded _stats2 sidecars") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_s2").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(0, 100).select(col("id").as("k"),
        lit(null).cast("long").as("dead"))
      .repartition(2).write.mode("overwrite").parquet(s"$root/data/w=1")
    Lakehouse.writeColStats(spark, root, "data/w=1", Seq("k", "dead"))
    Lakehouse.publishVersion(spark, root, 1, Seq.empty,
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=1")
        .map(("data", _, 1)))
    // the all-null column records null min/max: its files get NO stats
    // row, so a predicate on it keeps every file (conservative) and the
    // exact predicate still applies — null comparisons drop all rows
    assert(Lakehouse.readVersionPrunedCols(spark, root, 1, "k",
      Seq(("dead", 0L, 10L))).count() === 0)
    // …and the healthy column's stats still prune exactly
    assert(Lakehouse.readVersionPrunedCols(spark, root, 1, "k",
      Seq(("k", 0L, 49L))).count() === 50)
    // a rewrite supersedes w=1 wholesale: vacuum must reclaim its
    // _stats2 sidecar with it (the op whose purpose is reclamation
    // must not leak the newest sidecar kind) and keep the live one
    spark.range(0, 100).select(col("id").as("k"), col("id").as("dead"))
      .repartition(2).write.mode("overwrite").parquet(s"$root/data/w=2")
    Lakehouse.writeColStats(spark, root, "data/w=2", Seq("k", "dead"))
    Lakehouse.publishVersion(spark, root, 2, Seq.empty,
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=2")
        .map(("data", _, 2)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stats2/w=1")))
    Lakehouse.vacuum(spark, root, retainFrom = 2, graceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stats2/w=1")),
      "superseded _stats2 sidecar not reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stats2/w=2")),
      "live _stats2 sidecar wrongly reclaimed")
  }

  test("bloom file skipping: the point lookup scans a strict subset of " +
    "the hash-clustered files and loses no rows") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_bloom").toString + "/t"
    Lakehouse.buildBloomDemo(spark, sf, root)
    val nData = Lakehouse.manifestEntries(spark, root, 1).size
    assert(nData === 16)
    val looked = Lakehouse.readVersionBloomLookup(
      spark, root, 1, "o_orderkey", "o_custkey", 5L)
    looked.collect()
    val scanned = collectFileScans(looked.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).toSet
    // hash layout routes custkey 5 to ONE file; blooms keep it plus any
    // false positives — well under the full 16 at the sized ndv
    assert(scanned.nonEmpty && scanned.size < nData / 2,
      s"no skipping: scanned ${scanned.size} of $nData")
    val expect = spark.read.parquet(s"$root/data/w=1")
      .filter(col("o_custkey") === 5L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(looked.select("o_orderkey").collect().map(_.getLong(0))
      .sorted.toSeq === expect.toSeq)
    // a custkey absent from the table prunes everything but the schema
    // carrier and returns empty
    val none = Lakehouse.readVersionBloomLookup(
      spark, root, 1, "o_orderkey", "o_custkey", 99999999L)
    assert(none.count() === 0)
    val noneScanned = collectFileScans(none.queryExecution.executedPlan)
      .flatMap(_.relation.location.inputFiles).toSet
    assert(noneScanned.size <= 2,
      s"absent key still scanned ${noneScanned.size} files")
  }

  test("CDC across a metadata-only manifest merge reports zero changes; " +
    "a commit after the merge reports only its own files") {
    val root = freshRoot("cdcmm")
    // v7 = mergeManifests(v6): row-identical behind one manifest. The
    // manifest-level diff alone would re-list every live entry as an
    // insert (a consumer would duplicate the table); the seq refinement
    // must report NOTHING.
    val v7 = Lakehouse.mergeManifests(spark, root, 6)
    val (ins, dels) = Lakehouse.changedFiles(spark, root, 6, v7)
    assert(ins.isEmpty && dels.isEmpty,
      s"CDC across a row-identical manifest merge reported " +
        s"${ins.size} inserts / ${dels.size} deletes")
    // and an append on top of the merged snapshot reports exactly its
    // own files — the refinement filters rewrites, not real commits
    val batch = Lakehouse.readVersion(spark, root, 1, "o_orderkey")
      .limit(7).select("o_orderkey", "o_custkey", "o_orderdate",
        "o_totalprice")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$root/data/w=8x")
    Lakehouse.publishVersion(spark, root, 8,
      Lakehouse.snapshotManifests(spark, root, 7),
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=8x")
        .map(("data", _, 8)))
    val (ins8, dels8) = Lakehouse.changedFiles(spark, root, v7, 8)
    assert(dels8.isEmpty && ins8.nonEmpty &&
      ins8.forall(_.contains("/data/w=8x/")),
      "post-merge CDC lost or over-reported the real append")
    // spanning the merge (6 → 8) still reports only the real change
    val (ins68, dels68) = Lakehouse.changedFiles(spark, root, 6, 8)
    assert(dels68.isEmpty && ins68.toSet === ins8.toSet)
  }

  test("bloom sidecar probe is a distributed plan: the driver collects " +
    "(path, hit) planning rows, never filter bytes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_bloomplan").toString + "/t"
    Lakehouse.buildBloomDemo(spark, sf, root)
    val probe = Lakehouse.bloomProbeFrame(
      spark, Seq(s"$root/_blooms/w=1"), 5L)
    // plan lock: the probe's OUTPUT carries no binary column — the
    // ~90 KB-per-file filters are deserialized and tested executor-side
    assert(probe.schema.fields.map(f => f.name -> f.dataType.typeName)
      .toSeq === Seq("path" -> "string", "hit" -> "boolean"),
      s"probe output materializes more than planning rows: " +
        probe.schema.simpleString)
    val rows = probe.collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(rows.length === 16, "one probe row per bloomed file")
    // semantic lock: executor-side verdicts match a driver-side
    // deserialization of the same sidecars
    val hashed = spark.range(1)
      .select(xxhash64(lit(5L))).head().getLong(0)
    val reference = spark.read.parquet(s"$root/_blooms/w=1").collect()
      .map { r =>
        (r.getString(0), org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(
            r.getAs[Array[Byte]]("bloom"))).mightContainLong(hashed))
      }.toMap
    rows.foreach { case (p, hit) => assert(reference(p) === hit) }
    assert(rows.exists(_._2) && rows.exists(!_._2),
      "fixture should have both kept and pruned files")
  }

  test("rewrite_deletes: row-identical before/after, one cumulative " +
    "delete scan per plan group, superseded key files vacuum away, and " +
    "a later plain delete composes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_rd").toString + "/t"
    val vAfter = Lakehouse.buildRewriteDeletesDemo(spark, sf, root)
    val vBefore = vAfter - 1
    // the maintenance touched no data entry (paths AND seqs verbatim)
    val dataBefore = Lakehouse.manifestEntries(spark, root, vBefore)
      .filter(_._1 == "data")
    val after = Lakehouse.manifestEntries(spark, root, vAfter)
    assert(after.filter(_._1 == "data") === dataBefore,
      "rewrite_deletes touched a data entry")
    assert(after.count(_._1 == "delete") === 0 &&
      after.count(_._1 == "cdelete") === 3,
      "expected exactly one cumulative entry per distinct delete seq")
    // row-identical read across the rewrite
    val before = Lakehouse.readVersion(spark, root, vBefore, "o_orderkey")
      .orderBy("o_orderkey").collect()
    val rewritten = Lakehouse.readVersion(spark, root, vAfter, "o_orderkey")
      .orderBy("o_orderkey")
    assert(rewritten.collect() === before,
      "delete maintenance changed the read")
    // PLAN FAN-OUT: before, the D=3 delete commits union into growing
    // per-group sets (Σ applicable = O(D²) key-file plans); after, each
    // group anti-joins exactly ONE cumulative file
    def deleteScanFiles(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] = {
      df.collect()
      collectFileScans(df.queryExecution.executedPlan)
        .map(_.relation.location.inputFiles
          .filter(_.contains("/deletes/")).toSet)
        .filter(_.nonEmpty)
    }
    val preScans = deleteScanFiles(
      Lakehouse.readVersion(spark, root, vBefore, "o_orderkey"))
    val postScans = deleteScanFiles(
      Lakehouse.readVersion(spark, root, vAfter, "o_orderkey"))
    assert(preScans.map(_.size).sum > postScans.map(_.size).sum,
      s"maintenance did not shrink delete planning: " +
        s"${preScans.map(_.size)} -> ${postScans.map(_.size)}")
    assert(postScans.forall(_.size == 1),
      s"a post-rewrite group planned more than one delete file: " +
        postScans.map(_.size))
    // CDC SPANNING the rewrite: the plain delete manifests are gone
    // from the rewrite snapshot's list, so the span's delete set must
    // come from the smallest cumulative file — exactly the union of
    // the three delete commits' (distinct) keys, no data files
    val (insSpan, delsSpan) = Lakehouse.changedFiles(spark, root, 2, vAfter)
    assert(insSpan.isEmpty, "maintenance span reported phantom inserts")
    val orders = Tables.orders(spark, sf)
    val expectedDead = orders.filter(
      pmod(col("o_orderkey"), lit(10)) === 1 ||
        pmod(col("o_orderkey"), lit(7)) === 3 ||
        pmod(col("o_orderkey"), lit(13)) === 5)
      .select("o_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(spark.read.parquet(delsSpan: _*).collect()
      .map(_.getLong(0)).toSet === expectedDead,
      "CDC across the rewrite lost or inflated the span's delete set")
    // and the sub-span starting BETWEEN deletes uses a LATER cumulative
    // file (its keys are max-seq >= 4: the %10==1 commit is excluded
    // unless a key was re-deleted later)
    val (_, delsSub) = Lakehouse.changedFiles(spark, root, 3, vAfter)
    val subKeys = spark.read.parquet(delsSub: _*).collect()
      .map(_.getLong(0)).toSet
    val expectedSub = orders.filter(
      pmod(col("o_orderkey"), lit(7)) === 3 ||
        pmod(col("o_orderkey"), lit(13)) === 5)
      .select("o_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(subKeys === expectedSub,
      "mid-history CDC picked the wrong cumulative horizon")
    // a LATER plain delete commit composes with the cumulative files
    val extraDead = Lakehouse.readVersion(spark, root, vAfter, "o_orderkey")
      .filter(pmod(col("o_orderkey"), lit(17)) === 2).select("o_orderkey")
    val nExtra = extraDead.count()
    val v7 = Lakehouse.deleteCommit(spark, root, vAfter, extraDead)
    // CDC spanning rewrite AND the later plain delete unions both
    val (_, delsAll) = Lakehouse.changedFiles(spark, root, 2, v7)
    assert(spark.read.parquet(delsAll: _*).collect()
      .map(_.getLong(0)).toSet ===
      expectedDead ++ extraDead.collect().map(_.getLong(0)),
      "post-rewrite plain delete missing from the spanning CDC read")
    assert(Lakehouse.readVersion(spark, root, v7, "o_orderkey")
      .count() === before.length - nExtra,
      "post-rewrite plain delete did not compose")
    // and the superseded plain key files are unreferenced garbage now
    val reclaimed = Lakehouse.vacuum(spark, root, retainFrom = vAfter,
      graceMs = 0L)
    assert(reclaimed >= 3, s"expected the 3 superseded plain delete " +
      s"files reclaimed, got $reclaimed")
    assert(Lakehouse.readVersion(spark, root, v7, "o_orderkey")
      .count() === before.length - nExtra,
      "vacuum broke the retained post-rewrite read")
  }

  test("optimistic commits: interleaved writers land in a linear " +
    "history without re-running data work; overlapping-key deletes " +
    "still refuse") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_opt").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    Lakehouse.ingestCommit(root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), 0L,
      "o_orderkey")
    Lakehouse.ingestCommit(root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), 1L,
      "o_orderkey")
    val n = orders.count()
    // writer B wins version 3 from base v2 with a keyed delete…
    val v3 = Lakehouse.deleteCommit(spark, root, 2,
      orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select("o_orderkey"))
    assert(v3 === 3)
    // …writer A raced from the SAME base: its optimistic append loses
    // v3, re-resolves, and lands at v4 — no data re-staged, history
    // stays linear
    val extra = orders
      .withColumn("o_orderkey", col("o_orderkey") + lit(30000000L))
      .limit(500)
    val v4 = Lakehouse.appendCommitOptimistic(spark, root, 2, extra,
      "o_orderkey")
    assert(v4 === 4, "optimistic append did not land at the next version")
    // a DISJOINT-key optimistic delete from the stale base also lands
    val v5 = Lakehouse.deleteCommitOptimistic(spark, root, 2,
      orders.filter(pmod(col("o_orderkey"), lit(10)) === 5)
        .select("o_orderkey"))
    assert(v5 === 5)
    val n0 = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0).count()
    val n5 = orders.filter(pmod(col("o_orderkey"), lit(10)) === 5).count()
    assert(Lakehouse.readVersion(spark, root, 5, "o_orderkey")
      .count() === n - n0 - n5 + 500,
      "linear history lost a racing commit's effect")
    assert(Lakehouse.latestVersion(spark, root) === 5)
    // every intermediate state stays readable (snapshot isolation)
    assert(Lakehouse.readVersion(spark, root, 3, "o_orderkey")
      .count() === n - n0)
    assert(Lakehouse.readVersion(spark, root, 4, "o_orderkey")
      .count() === n - n0 + 500)
    // an OVERLAPPING-key delete from the stale base must refuse: the
    // intervening v3/v5 deletes touched the same keys, so a silent
    // retry could mask another writer's intent — caller must rebase
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.deleteCommitOptimistic(spark, root, 2,
        orders.filter(pmod(col("o_orderkey"), lit(20)) === 0)
          .select("o_orderkey"))
    }
    assert(Lakehouse.latestVersion(spark, root) === 5,
      "a refused optimistic commit still published")
    // optimistic MERGE, disjoint keys from the stale base: lands at v6
    // with its updates applied over the racing history
    val upd = orders.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 7.0)
    val v6 = Lakehouse.mergeCommitOptimistic(spark, root, 2, upd,
      "o_orderkey")
    assert(v6 === 6)
    val n3 = orders.filter(pmod(col("o_orderkey"), lit(10)) === 3).count()
    val merged = Lakehouse.readVersion(spark, root, 6, "o_orderkey")
    assert(merged.count() === n - n0 - n5 + 500)
    // scope to ORIGINAL keys: the racing append's offset keys also hit
    // %10==3 but were not in the merge's key set
    val updSum = merged.filter(pmod(col("o_orderkey"), lit(10)) === 3 &&
        col("o_orderkey") < 30000000L)
      .agg(sum("o_totalprice")).head().getDouble(0)
    val origSum = orders.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(updSum - origSum - 7.0 * n3) < 1e-6,
      "optimistic merge lost its update over the racing history")
    // optimistic MERGE whose keys an intervening commit DELETED must
    // refuse — re-publishing would resurrect them (serializable check)
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.mergeCommitOptimistic(spark, root, 2,
        orders.filter(pmod(col("o_orderkey"), lit(10)) === 5)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0),
        "o_orderkey")
    }
    // …and one whose keys an intervening commit INSERTED must refuse
    // too — its values were computed against the stale base
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.mergeCommitOptimistic(spark, root, 2,
        extra.withColumn("o_totalprice", col("o_totalprice") + 1.0),
        "o_orderkey")
    }
    assert(Lakehouse.latestVersion(spark, root) === 6,
      "a refused optimistic merge still published")
    // STRICT delete (serializable opt-in): keys the intervening v4
    // append INSERTED must refuse — the caller derived its key set from
    // base v2 and never observed those rows, so a re-stamped delete
    // would mask rows it never read. The default snapshot-isolation
    // mode documents the opposite choice: same keys, same stale base,
    // lands (standard DELETE semantics — mask wherever they live).
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.deleteCommitOptimistic(spark, root, 2,
        extra.select("o_orderkey"), strict = true)
    }
    assert(Lakehouse.latestVersion(spark, root) === 6,
      "a refused strict delete still published")
    val v7 = Lakehouse.deleteCommitOptimistic(spark, root, 2,
      extra.select("o_orderkey"))
    assert(v7 === 7)
    assert(Lakehouse.readVersion(spark, root, 7, "o_orderkey")
      .count() === n - n0 - n5,
      "snapshot-isolation delete did not mask the raced-in rows")
  }

  test("maintenance commits are optimistic: rewrite_deletes, manifest " +
    "merge, and compaction land linearly over racing data commits; " +
    "a genuinely conflicting race refuses") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_mopt").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    for (i <- 0 until 4)
      Lakehouse.ingestCommit(root,
        orders.filter(pmod(col("o_orderkey"), lit(4)) === i), i.toLong,
        "o_orderkey")
    def cnt(v: Int): Long =
      Lakehouse.readVersion(spark, root, v, "o_orderkey").count()
    def delKeys(m: Int): org.apache.spark.sql.DataFrame =
      orders.filter(pmod(col("o_orderkey"), lit(10)) === m)
        .select("o_orderkey")
    val v5 = Lakehouse.deleteCommit(spark, root, 4, delKeys(0))
    val v6 = Lakehouse.deleteCommit(spark, root, v5, delKeys(1))
    // a data commit beats the stale-based rewrite_deletes: the rewrite
    // must retry and land at v8 carrying the append, row-identical
    val extra = orders
      .withColumn("o_orderkey", col("o_orderkey") + lit(30000000L))
      .limit(500)
    val v7 = Lakehouse.appendCommitOptimistic(spark, root, v6, extra,
      "o_orderkey")
    val n7 = cnt(v7)
    val v8 = Lakehouse.rewriteDeletes(spark, root, v6, "o_orderkey")
    assert(v8 === 8, "stale-based rewrite_deletes did not retry-land")
    assert(cnt(v8) === n7, "optimistic rewrite_deletes lost rows")
    // manifest merge from a stale base: pure metadata, re-derives from
    // the winner and lands row-identically
    val extra2 = orders
      .withColumn("o_orderkey", col("o_orderkey") + lit(40000000L))
      .limit(300)
    val v9 = Lakehouse.appendCommitOptimistic(spark, root, v8, extra2,
      "o_orderkey")
    val v10 = Lakehouse.mergeManifests(spark, root, v8)
    assert(v10 === 10, "stale-based manifest merge did not retry-land")
    assert(cnt(v10) === cnt(v9), "optimistic manifest merge lost rows")
    assert(Lakehouse.snapshotManifests(spark, root, v10).size === 1)
    // compaction from a stale base with an INTERVENING DELETE: the
    // staged files re-stamp to seq=fromV so the racing delete keeps
    // masking its keys inside them
    val v11 = Lakehouse.deleteCommit(spark, root, v10, delKeys(2))
    val n11 = cnt(v11)
    val v12 = Lakehouse.compactCommit(spark, root, v10, "o_orderkey")
    assert(v12 === 12, "stale-based compaction did not retry-land")
    assert(cnt(v12) === n11,
      "racing delete stopped masking inside the re-stamped compaction")
    // rewrite_deletes racing a DISJOINT-key delete: lands, composed
    val v13 = Lakehouse.deleteCommit(spark, root, v12, delKeys(4))
    val n13 = cnt(v13)
    val v14 = Lakehouse.rewriteDeletes(spark, root, v12, "o_orderkey")
    assert(v14 === 14)
    assert(cnt(v14) === n13,
      "rewrite_deletes dropped a disjoint racing delete's mask")
    // …and racing an OVERLAPPING-key delete: refuses (the cumulative
    // nesting no longer covers that key's true max seq — re-run folds
    // it in from the new base)
    val v15 = Lakehouse.deleteCommit(spark, root, v14,
      orders.filter(pmod(col("o_orderkey"), lit(20)) === 2)
        .select("o_orderkey"))
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.rewriteDeletes(spark, root, v14, "o_orderkey")
    }
    assert(Lakehouse.latestVersion(spark, root) === v15,
      "a refused maintenance commit still published")
    // the refused op's re-run from the new base lands and stays
    // row-identical
    val v16 = Lakehouse.rewriteDeletes(spark, root, v15, "o_orderkey")
    assert(cnt(v16) === cnt(v15))
  }

  test("commits are idempotent and a stranded staging manifest recovers") {
    val root = freshRoot("crash")
    val fsRoot = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestDirs(): Int = fsRoot.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/_manifests"))
      .count(!_.getPath.getName.startsWith("."))
    val mBefore = manifestDirs()
    val before = Lakehouse.manifestEntries(spark, root, 3)
    // re-driving an already-committed version with the SAME entries is
    // the idempotent replay case: a no-op — and the replay attempt's
    // own manifest must not survive as garbage
    Lakehouse.commitVersion(spark, root, 3, before)
    assert(Lakehouse.manifestEntries(spark, root, 3) === before,
      "recommit mutated an immutable manifest")
    assert(manifestDirs() === mBefore,
      "idempotent replay left an unreferenced manifest behind")
    // a CONFLICTING commit at the same version is a lost race, not a
    // replay — it must throw so the loser rebases instead of silently
    // losing its entries (and the loser's manifest is reclaimed)
    intercept[Lakehouse.ConcurrentCommitException] {
      Lakehouse.commitVersion(spark, root, 3,
        Seq(("data", "bogus/path", 3)))
    }
    assert(Lakehouse.manifestEntries(spark, root, 3) === before)
    assert(manifestDirs() === mBefore,
      "losing commit left an unreferenced manifest behind")
    // simulate a crash AFTER staging, BEFORE rename: strand a staging
    // snapshot for a new version, then re-drive the commit normally
    import spark.implicits._
    Seq("_manifests/stale").toDF("mpath").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/_snapshots/.v=7.staging")
    Lakehouse.commitVersion(spark, root, 7,
      Lakehouse.manifestEntries(spark, root, 4))
    assert(Lakehouse.manifestEntries(spark, root, 7) ===
      Lakehouse.manifestEntries(spark, root, 4))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/_snapshots/.v=7.staging")),
      "staging not cleaned up after publish")
    // bookkeeping stays invisible to a discovery reader over the root:
    // _manifests and dot-staging never surface as data
    val discovered = spark.read.parquet(s"$root/data/w=4")
    assert(discovered.columns.contains("o_orderkey"))
  }

  test("position deletes: metadata-only commit, mixed masks on one " +
    "snapshot, CDC rows, rewrite/compact/vacuum composition") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_pd").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select(Lakehouse.OrdersCols.map(col): _*)
    // v1 base load (all orders), v2 equality delete (%10 == 4), v3
    // POSITION delete (predicate o_custkey %7 == 2, coordinates from
    // the live scan of v2)
    orders.repartition(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$root/data/w=1")
    Lakehouse.commitVersion(spark, root, 1,
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=1")
        .map(("data", _, 1)))
    val v2 = Lakehouse.deleteCommit(spark, root, 1,
      Lakehouse.readVersion(spark, root, 1, "o_orderkey")
        .filter(pmod(col("o_orderkey"), lit(10)) === 4)
        .select("o_orderkey"))
    val v3 = Lakehouse.positionalDeleteCommit(spark, root, v2,
      pmod(col("o_custkey"), lit(7L)) === 2, "o_orderkey")
    // metadata-only: v3's data+delete entries identical to v2's, plus
    // only the pdelete file(s)
    val e2 = Lakehouse.manifestEntries(spark, root, v2)
    val e3 = Lakehouse.manifestEntries(spark, root, v3)
    assert(e3.filter(_._1 != "pdelete") === e2,
      "position delete rewrote or dropped an existing entry")
    val pd = e3.filter(_._1 == "pdelete")
    assert(pd.nonEmpty && pd.forall(_._2.startsWith("pdeletes/w=3")))
    // mixed masks on one snapshot ≡ the two-predicate state
    val expect = orders
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 4 &&
        pmod(col("o_custkey"), lit(7L)) =!= 2)
    val got3 = Lakehouse.readVersion(spark, root, v3, "o_orderkey")
    assert(got3.count() === expect.count())
    assert(got3.select("o_orderkey").except(expect.select("o_orderkey"))
      .isEmpty && expect.select("o_orderkey")
      .except(got3.select("o_orderkey")).isEmpty,
      "mixed equality+position read diverged from the predicate state")
    // CDC: the span's positionally-deleted ROWS are reconstructible
    // from the masks — exactly the live-v2 rows the predicate matched
    val cdc = Lakehouse.positionalDeletedRows(spark, root, v2, v3)
    val expectDel = orders
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 4 &&
        pmod(col("o_custkey"), lit(7L)) === 2)
    assert(cdc.count() === expectDel.count())
    assert(cdc.select("o_orderkey")
      .except(expectDel.select("o_orderkey")).isEmpty,
      "positional CDC reported a row the predicate never deleted")
    // delete-file maintenance CARRIES the positional masks verbatim
    // (they have no keys to fold into the cumulative files)
    val v4 = Lakehouse.rewriteDeletes(spark, root, v3, "o_orderkey")
    assert(Lakehouse.manifestEntries(spark, root, v4)
      .exists(_._1 == "pdelete"),
      "rewrite_deletes dropped the position masks")
    assert(Lakehouse.readVersion(spark, root, v4, "o_orderkey")
      .count() === expect.count())
    // compaction materializes both mask kinds away — and is
    // CDC-invisible (staged files stamp seq = fromV)
    val v5 = Lakehouse.compactCommit(spark, root, v4, "o_orderkey")
    assert(Lakehouse.manifestEntries(spark, root, v5)
      .forall(_._1 == "data"))
    assert(Lakehouse.readVersion(spark, root, v5, "o_orderkey")
      .count() === expect.count())
    val (insC, delC) = Lakehouse.changedFiles(spark, root, v4, v5)
    assert(insC.isEmpty && delC.isEmpty,
      "compaction surfaced in the CDC feed")
    // vacuum from the compacted horizon reclaims the superseded
    // pdelete file with the pre-compaction data
    assert(Lakehouse.vacuum(spark, root, retainFrom = v5,
      graceMs = 0L) > 0)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pdPath = new org.apache.hadoop.fs.Path(s"$root/${pd.head._2}")
    assert(!fs.exists(pdPath), "vacuum left the superseded pdelete file")
    assert(Lakehouse.readVersion(spark, root, v5, "o_orderkey")
      .count() === expect.count(), "retained read broke after vacuum")
  }

  test("field-id schema evolution: rename is metadata-only and history " +
    "reads the old name, widen casts old files up, add-after-drop " +
    "never resurrects dropped data") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lh_se").toString + "/t"
    def land(tag: String, df: org.apache.spark.sql.DataFrame, seq: Int) = {
      df.repartition(2).write.mode("overwrite")
        .parquet(s"$root/data/w=$tag")
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=$tag")
        .map(("data", _, seq))
    }
    // v1: (k int, amt int) under ids (1, 2)
    Lakehouse.writeSchemaLog(spark, root, 1,
      Seq((1, "k", "int"), (2, "amt", "int")))
    Lakehouse.publishVersion(spark, root, 1, Seq.empty,
      land("1", spark.range(0, 50)
        .select(col("id").cast("int").as("k"),
          (col("id") * 2).cast("int").as("amt")), 1))
    // v2: RENAME amt -> amount — must inherit v1's manifests untouched
    val v2 = Lakehouse.renameColumn(spark, root, 1, "amt", "amount")
    assert(Lakehouse.manifestEntries(spark, root, v2) ===
      Lakehouse.manifestEntries(spark, root, 1),
      "rename touched the manifest entries")
    assert(Lakehouse.readVersionByFieldId(spark, root, v2)
      .columns.toSeq === Seq("k", "amount"))
    // time travel BEFORE the rename still reads the OLD name
    val atV1 = Lakehouse.readVersionByFieldId(spark, root, 1)
    assert(atV1.columns.toSeq === Seq("k", "amt"))
    assert(atV1.filter(col("amt") =!= col("k") * 2).isEmpty)
    // v3: WIDEN amount int -> bigint; old int files cast up in place
    val v3 = Lakehouse.widenColumn(spark, root, v2, "amount", "bigint")
    val widened = Lakehouse.readVersionByFieldId(spark, root, v3)
    assert(widened.schema("amount").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(widened.agg(sum("amount")).as[Long].head === 49L * 50L)
    // v4: DROP amount — field vanishes from the current read but the
    // files keep the bytes (v3 time travel above stays valid)
    val v4 = Lakehouse.dropColumn(spark, root, v3, "amount")
    assert(Lakehouse.readVersionByFieldId(spark, root, v4)
      .columns.toSeq === Seq("k"))
    // v5: re-ADD amount — FRESH field id, so the dropped field's data
    // must NOT resurrect: pre-existing rows read null
    val v5 = Lakehouse.addColumn(spark, root, v4, "amount", "bigint")
    assert(Lakehouse.schemaAt(spark, root, v5)
      .find(_._2 == "amount").get._1 > 2, "re-add reused the dropped id")
    val atV5 = Lakehouse.readVersionByFieldId(spark, root, v5)
    assert(atV5.filter(col("amount").isNotNull).isEmpty,
      "dropped data resurrected under the re-added name")
    // v6: append carrying the NEW field — only those rows surface it
    Lakehouse.publishVersion(spark, root, 6,
      Lakehouse.snapshotManifests(spark, root, v5),
      land("6", spark.range(100, 120)
        .select(col("id").cast("int").as("k"),
          (col("id") * 7).cast("bigint").as("amount")), 6))
    val atV6 = Lakehouse.readVersionByFieldId(spark, root, 6)
    assert(atV6.filter(col("k") < 100 && col("amount").isNotNull).isEmpty)
    assert(atV6.filter(col("k") >= 100)
      .filter(col("amount") =!= col("k") * 7L).isEmpty)
    assert(atV6.count() === 70)
    // and v3 history is still fully readable AFTER the later evolution
    assert(Lakehouse.readVersionByFieldId(spark, root, v3)
      .agg(sum("amount")).as[Long].head === 49L * 50L)
  }

  test("expireSnapshots: ref-pinned and horizon versions survive, " +
    "expired versions refuse time travel, vacuum reclaims exactly the " +
    "newly-unreferenced files, re-run is a no-op") {
    val root = freshRoot("exp")
    val preV2 = Lakehouse.readVersion(spark, root, 2, "o_orderkey").count()
    val preV6 = Lakehouse.readVersion(spark, root, 6, "o_orderkey").count()
    val v3DeleteFiles = Lakehouse.manifestEntries(spark, root, 3)
      .collect { case ("delete", p, _) => p }
    assert(v3DeleteFiles.nonEmpty)
    // pin v2 with an audit tag; the horizon keeps v5/v6
    Lakehouse.setRef(spark, root, "audit", 2)
    assert(Lakehouse.expireSnapshots(spark, root, keepFrom = 5)
      === Seq(1, 3, 4))
    // expired: crisp refusal, not a parquet path error
    Seq(1, 3, 4).foreach { v =>
      val e = intercept[IllegalArgumentException](
        Lakehouse.readVersion(spark, root, v, "o_orderkey").count())
      assert(e.getMessage.contains("expired"), s"v$v: ${e.getMessage}")
    }
    // a CDC span touching an expired version fails the same way (the
    // cursor-within-retention contract feed consumers rely on)
    assert(intercept[IllegalArgumentException](
      Lakehouse.changedFiles(spark, root, 3, 5))
      .getMessage.contains("expired"))
    // surviving: the pinned tag and the horizon, row-identical
    assert(Lakehouse.readVersion(spark, root, 2, "o_orderkey").count()
      === preV2)
    assert(Lakehouse.getRef(spark, root, "audit") === 2)
    assert(Lakehouse.latestVersion(spark, root) === 6)
    // vacuum at the horizon: v3's delete file is the ONLY
    // newly-unreachable data (v1/v2 files live via the pin, v4's via
    // v5/v6 manifest reuse) — reclaim count proves exactness
    val reclaimed = Lakehouse.vacuum(spark, root, retainFrom = 5,
      graceMs = 0L)
    assert(reclaimed === v3DeleteFiles.size,
      s"expected only ${v3DeleteFiles.size} v3 delete file(s) reclaimed")
    v3DeleteFiles.foreach(p =>
      assert(!new java.io.File(s"$root/$p").exists(), s"$p not reclaimed"))
    // post-reclaim reads: pinned and head both byte-stable
    assert(Lakehouse.readVersion(spark, root, 2, "o_orderkey").count()
      === preV2)
    assert(Lakehouse.readVersion(spark, root, 6, "o_orderkey").count()
      === preV6)
    // idempotent re-run finds nothing; a horizon past head is refused
    assert(Lakehouse.expireSnapshots(spark, root, keepFrom = 5).isEmpty)
    intercept[IllegalArgumentException](
      Lakehouse.expireSnapshots(spark, root, keepFrom = 7))
    // moving the pin OFF v2 releases it: the next expire pass takes it
    Lakehouse.setRef(spark, root, "audit", 6)
    assert(Lakehouse.expireSnapshots(spark, root, keepFrom = 5)
      === Seq(2))
  }

  test("timestamp time travel and age-based expiry: AS OF resolves " +
    "monotonically, pre-creation timestamps refuse, and older-than " +
    "delegates to the version horizon") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ts").toString + "/t"
    def commit(v: Int, from: Long, to: Long): Unit = {
      spark.range(from, to).select(col("id").as("k"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/data/w=$v")
      Lakehouse.publishVersion(spark, root, v,
        if (v == 1) Seq.empty
        else Lakehouse.snapshotManifests(spark, root, v - 1),
        Lakehouse.listDataFiles(spark, root, s"$root/data/w=$v")
          .map(("data", _, v)))
    }
    val t0 = System.currentTimeMillis() - 5
    commit(1, 0, 10); Thread.sleep(25)
    val t12 = System.currentTimeMillis()
    Thread.sleep(25); commit(2, 10, 20); Thread.sleep(25)
    val t23 = System.currentTimeMillis()
    Thread.sleep(25); commit(3, 20, 30)
    val ts = Lakehouse.commitTimestamps(spark, root)
    assert(ts.map(_._1) === Seq(1, 2, 3))
    assert(ts.map(_._2) === ts.map(_._2).sorted, "timestamps not monotone")
    // AS OF: between commits resolves to the earlier one; now → head
    assert(Lakehouse.versionAsOf(spark, root, t12) === 1)
    assert(Lakehouse.versionAsOf(spark, root, t23) === 2)
    assert(Lakehouse.versionAsOf(spark, root,
      System.currentTimeMillis()) === 3)
    intercept[IllegalArgumentException](
      Lakehouse.versionAsOf(spark, root, t0))
    // age-based expiry: everything older than t23 retires (v1, v2);
    // the AS OF read that used to hit v1 now refuses — time travel
    // respects the retention horizon
    assert(Lakehouse.expireSnapshotsOlderThan(spark, root, t23)
      === Seq(1, 2))
    intercept[IllegalArgumentException](
      Lakehouse.versionAsOf(spark, root, t12))
    assert(Lakehouse.versionAsOf(spark, root,
      System.currentTimeMillis()) === 3)
    // a cutoff beyond every commit keeps the head (never expire it)
    assert(Lakehouse.expireSnapshotsOlderThan(spark, root,
      System.currentTimeMillis() + 60000).isEmpty)
  }

  test("fast-forward merge: lands on the branch head while main sits " +
    "at the base, refuses a diverged main, and a rebase-fresh branch " +
    "merges cleanly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ff").toString + "/t"
    def land(tag: String, from: Long, to: Long, seq: Int) = {
      spark.range(from, to).select(col("id").as("k"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/data/w=$tag")
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=$tag")
        .map(("data", _, seq))
    }
    Lakehouse.publishVersion(spark, root, 1, Seq.empty, land("1", 0, 10, 1))
    Lakehouse.setRef(spark, root, "main", 1)
    Lakehouse.setRef(spark, root, "dev", 1)
    Lakehouse.publishVersion(spark, root, 2,
      Lakehouse.snapshotManifests(spark, root, 1), land("2", 10, 20, 2))
    Lakehouse.setRef(spark, root, "dev", 2)
    // main still at the base: the merge is a clean metadata move...
    // but first, DIVERGE main and pin the refusal
    Lakehouse.publishVersion(spark, root, 3,
      Lakehouse.snapshotManifests(spark, root, 1), land("3", 20, 30, 3))
    Lakehouse.setRef(spark, root, "main", 3)
    val e = intercept[Lakehouse.ConcurrentCommitException](
      Lakehouse.fastForward(spark, root, "main", "dev"))
    assert(e.getMessage.contains("diverged"))
    assert(Lakehouse.getRef(spark, root, "main") === 3,
      "a refused merge must not move main")
    // rebase: a fresh branch from the NEW head carries the work over
    Lakehouse.setRef(spark, root, "dev2", 3)
    Lakehouse.publishVersion(spark, root, 4,
      Lakehouse.snapshotManifests(spark, root, 3), land("4", 10, 20, 4))
    Lakehouse.setRef(spark, root, "dev2", 4)
    assert(Lakehouse.fastForward(spark, root, "main", "dev2") === 4)
    assert(Lakehouse.getRef(spark, root, "main") === 4)
    assert(Lakehouse.readVersion(spark, root, 4, "k").count() === 30)
  }

  test("auto-maintenance planner: decisions follow the metrics, " +
    "re-measured after each op, and every pass is row-invisible") {
    import Lakehouse.MaintenancePolicy
    val noSize = MaintenancePolicy(maxSmallFiles = Int.MaxValue)
    // SCENARIO 1 — delete debt: 3 plain delete commits > 2 justify the
    // rewrite; the rewrite snapshot resets the manifest list, so the
    // re-measured metrics stop the merge stage
    val r1 = java.nio.file.Files
      .createTempDirectory("graft_am_debt").toString + "/t"
    val v1 = Lakehouse.buildDeleteDebtDemo(spark, sf, r1)
    val m1 = Lakehouse.tableMetrics(spark, r1, v1, 1L << 20)
    assert(m1.deleteCommits === 3 && m1.manifests === 5)
    val before = Lakehouse.readVersion(spark, r1, v1, "o_orderkey")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val (nv1, acts1) =
      Lakehouse.autoMaintain(spark, r1, v1, "o_orderkey", noSize)
    assert(acts1 === Seq("rewriteDeletes"), s"debt table ran $acts1")
    val after = Lakehouse.readVersion(spark, r1, nv1, "o_orderkey")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(after === before, "maintenance changed the row set")
    val m1b = Lakehouse.tableMetrics(spark, r1, nv1, 1L << 20)
    assert(m1b.deleteCommits === 0 && m1b.manifests === 1)
    // healthy now: the planner is a metadata read and nothing else
    val (nv1c, acts1c) =
      Lakehouse.autoMaintain(spark, r1, nv1, "o_orderkey", noSize)
    assert(acts1c.isEmpty && nv1c === nv1)
    // SCENARIO 2 — append-heavy: manifest rent alone justifies only
    // the merge
    val r2 = java.nio.file.Files
      .createTempDirectory("graft_am_app").toString + "/t"
    def land(root: String, tag: String, from: Long, to: Long,
        seq: Int): Seq[(String, String, Int)] = {
      spark.range(from, to)
        .select(col("id").as("k"), (col("id") * 2).as("x"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/data/w=$tag")
      Lakehouse.listDataFiles(spark, root, s"$root/data/w=$tag")
        .map(("data", _, seq))
    }
    Lakehouse.publishVersion(spark, r2, 1, Seq.empty,
      land(r2, "1", 0, 10, 1))
    (2 to 6).foreach { v =>
      Lakehouse.publishVersion(spark, r2, v,
        Lakehouse.snapshotManifests(spark, r2, v - 1),
        land(r2, v.toString, v * 10L, v * 10L + 10, v))
    }
    val (nv2, acts2) =
      Lakehouse.autoMaintain(spark, r2, 6, "k", noSize)
    assert(acts2 === Seq("mergeManifests"), s"append table ran $acts2")
    assert(Lakehouse.tableMetrics(spark, r2, nv2, 1L << 20)
      .manifests === 1)
    assert(Lakehouse.readVersion(spark, r2, nv2, "k").count() === 60)
    // SCENARIO 3 — small files + delete debt: compaction fires FIRST
    // and its copy-on-write rewrite clears the delete debt and the
    // manifest rent, so nothing else runs
    val r3 = java.nio.file.Files
      .createTempDirectory("graft_am_small").toString + "/t"
    Lakehouse.publishVersion(spark, r3, 1, Seq.empty,
      land(r3, "1", 0, 10, 1))
    (2 to 6).foreach { v =>
      Lakehouse.publishVersion(spark, r3, v,
        Lakehouse.snapshotManifests(spark, r3, v - 1),
        land(r3, v.toString, v * 10L, v * 10L + 10, v))
    }
    var v3 = 6
    Seq(0L, 1L, 2L).foreach { r =>
      v3 = Lakehouse.deleteCommit(spark, r3, v3,
        spark.range(0, 70).select(col("id").as("k"))
          .filter(pmod(col("k"), lit(10)) === r).select("k"))
    }
    val (nv3, acts3) = Lakehouse.autoMaintain(spark, r3, v3, "k",
      MaintenancePolicy(maxSmallFiles = 2, smallBytes = 1L << 20))
    assert(acts3 === Seq("compact"), s"small-file table ran $acts3")
    val m3 = Lakehouse.tableMetrics(spark, r3, nv3, 1L << 20)
    assert(m3.deleteCommits === 0 && m3.manifests === 1 &&
      m3.dataFiles === 1, s"compaction did not reset the debts: $m3")
    val live3 = Lakehouse.readVersion(spark, r3, nv3, "k")
      .select("k").collect().map(_.getLong(0)).sorted
    val expect3 = ((0L until 10L) ++ (20L until 70L))
      .filter(_ % 10 > 2).toArray.sorted
    assert(live3 === expect3, "compaction changed the live row set")
  }
}
