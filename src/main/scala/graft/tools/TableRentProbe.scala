package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Lakehouse

/** Commit-count rent for the versioned table: does read latency grow
  * with APPEND count or only with DELETE count? readVersion groups data
  * files by applicable-delete set, so the claim is: E append commits
  * plan ONE scan group (flat read cost as E grows), D delete commits
  * plan D+1 groups (the real rent), and one compaction resets to a
  * single group — the merge-cadence economics, measured. */
object TableRentProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (T, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // local-iteration escape hatch (the Bench/Verify filter contract):
    // run only the named section; unset → all sections
    val section = sys.env.get("SPARK_GRAFT_RENT_SECTION")
    def wants(name: String): Boolean = section.forall(_ == name)
    val base = Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .localCheckpoint()
    def bestOf2(root: String, v: Int): Double = {
      def run() = time {
        Lakehouse.readVersion(spark, root, v, "o_orderkey").count() }._2
      run(); math.min(run(), run())
    }
    if (wants("append")) {
    println("== append-count rent: E ingest commits, zero deletes ==")
    for (e <- Seq(4, 16, 64)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_a$e"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val (_, tIngest) = time {
        for (i <- 0 until e)
          Lakehouse.ingestCommit(root,
            base.filter(pmod(col("o_orderkey"), lit(e.toLong)) === i),
            i.toLong, "o_orderkey")
      }
      val tRead = bestOf2(root, e)
      println(f"E=$e%-4d ingest=$tIngest%7.2fs read=$tRead%5.2fs " +
        f"(same rows every E — flat read is the claim)")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    if (wants("metadata")) {
    println("== metadata rent: manifest rows written per commit " +
      "(two-level) vs the single-level re-list counterfactual ==")
    for (e <- Seq(16, 64, 256)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_m$e"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val (_, tIngest) = time {
        for (i <- 0 until e)
          Lakehouse.ingestCommit(root,
            base.filter(pmod(col("o_orderkey"), lit(e.toLong)) === i),
            i.toLong, "o_orderkey")
      }
      // rows actually written: each commit's own manifest (delta) plus
      // its snapshot list (one row per live manifest). Counterfactual:
      // a single-level scheme re-lists every live entry per commit.
      var written = 0L; var lists = 0L; var counterfactual = 0L
      var prev = Set.empty[String]
      for (v <- 1 to e) {
        val lst = Lakehouse.snapshotManifests(spark, root, v)
        written += Lakehouse.readManifests(spark, root,
          lst.filterNot(prev)).size
        lists += lst.size
        counterfactual += Lakehouse.manifestEntries(spark, root, v).size
        prev = lst.toSet
      }
      println(f"E=$e%-4d ingest=$tIngest%7.2fs manifestRows=$written%6d " +
        f"listRows=$lists%6d vs singleLevel=$counterfactual%8d " +
        f"(${counterfactual.toDouble / (written + lists)}%5.1fx)")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    if (wants("metadata")) {
    println("== metadata rent at realistic commit width: f=64 entries " +
      "per commit (synthetic paths — pure metadata, no data written) ==")
    for (e <- Seq(64, 256)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_s$e"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val f = 64
      val (_, tCommit) = time {
        for (v <- 1 to e) {
          val prev = if (v == 1) Seq.empty[String]
            else Lakehouse.snapshotManifests(spark, root, v - 1)
          Lakehouse.publishVersion(spark, root, v, prev,
            (0 until f).map(i => ("data", s"data/w=$v/f$i.parquet", v)))
        }
      }
      var written = 0L; var lists = 0L; var counterfactual = 0L
      var prev = Set.empty[String]
      for (v <- 1 to e) {
        val lst = Lakehouse.snapshotManifests(spark, root, v)
        written += Lakehouse.readManifests(spark, root,
          lst.filterNot(prev)).size
        lists += lst.size
        counterfactual += Lakehouse.manifestEntries(spark, root, v).size
        prev = lst.toSet
      }
      println(f"E=$e%-4d f=$f commits=$tCommit%7.2fs " +
        f"manifestRows=$written%7d listRows=$lists%7d " +
        f"vs singleLevel=$counterfactual%9d " +
        f"(${counterfactual.toDouble / (written + lists)}%5.1fx)")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    if (wants("expire")) {
    println("== retention rent: full-history metadata walks vs the " +
      "expired horizon (f=16 synthetic entries per commit — pure " +
      "metadata; expire keeps the last 8 versions) ==")
    for (e <- Seq(64, 256)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_x$e"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val f = 16
      for (v <- 1 to e) {
        val prev = if (v == 1) Seq.empty[String]
          else Lakehouse.snapshotManifests(spark, root, v - 1)
        Lakehouse.publishVersion(spark, root, v, prev,
          (0 until f).map(i => ("data", s"data/w=$v/f$i.parquet", v)))
      }
      // the walks a retention-era tool pays: the timestamp index (one
      // stat per snapshot) and vacuum's retained-set derivation (one
      // snapshot list + manifest read per retained version)
      def walks(retainFrom: Int): (Double, Double) = {
        val (_, tTs) = time {
          Lakehouse.commitTimestamps(spark, root): Unit }
        val (_, tVac) = time {
          Lakehouse.vacuum(spark, root, retainFrom, graceMs = 0L): Unit }
        (tTs, tVac)
      }
      val (tTsPre, tVacPre) = walks(retainFrom = 1)
      val (_, tExpire) = time {
        Lakehouse.expireSnapshots(spark, root, keepFrom = e - 7) }
      val (tTsPost, tVacPost) = walks(retainFrom = e - 7)
      // expire alone shrinks SNAPSHOT metadata; the E per-commit
      // MANIFESTS stay referenced by the surviving heads (the data is
      // live). The composed policy — manifest merge, then expire past
      // the rewrite, then vacuum — is what resets manifest count to 1:
      // the maintenance trio again, at the metadata level.
      val merged = Lakehouse.mergeManifests(spark, root, e)
      Lakehouse.expireSnapshots(spark, root, keepFrom = merged): Unit
      Lakehouse.vacuum(spark, root, merged, graceMs = 0L): Unit
      val mLeft = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_manifests")).length
      println(f"E=$e%-4d tsWalk=$tTsPre%6.3fs→$tTsPost%6.3fs " +
        f"vacuumWalk=$tVacPre%6.2fs→$tVacPost%6.2fs " +
        f"expire=$tExpire%5.2fs manifestsAfterMergeExpireVacuum=$mLeft%3d")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    if (wants("delete")) {
    println("== delete-count rent: 16 appends + D delete commits ==")
    for (dd <- Seq(1, 4, 16)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_d$dd"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      for (i <- 0 until 16)
        Lakehouse.ingestCommit(root,
          base.filter(pmod(col("o_orderkey"), lit(16L)) === i),
          i.toLong, "o_orderkey")
      var v = 16
      val (_, tDels) = time {
        for (j <- 0 until dd)
          v = Lakehouse.deleteCommit(spark, root, v,
            base.filter(pmod(col("o_orderkey"), lit(100L)) === j)
              .select("o_orderkey"))
      }
      val tRead = bestOf2(root, v)
      val (_, tCompact) = time {
        v = Lakehouse.compactCommit(spark, root, v, "o_orderkey", 32) }
      val tPost = bestOf2(root, v)
      println(f"D=$dd%-3d deletes=$tDels%6.2fs read=$tRead%5.2fs " +
        f"compact=$tCompact%6.2fs readPost=$tPost%5.2fs")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    if (wants("deleteplan")) {
    println("== delete-plan rent: D INTERLEAVED ingest+delete pairs — " +
      "planned delete-file scans Σ|group mask| is O(D²) before " +
      "rewrite_deletes and O(D) after; the read must be row-identical. " +
      "STORAGE column: cumulative key files nest (a key deleted at seq " +
      "m recurs in every cumulative file d >= m), so post-rewrite " +
      "delete rows on disk are O(D^2 · keys-per-delete) vs the plain " +
      "files' O(D) — the disk rent bought for the linear read plan ==")
    // delete rows + bytes on disk for the files version v references
    def delStorage(root: String, v: Int): (Long, Long) = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val paths = Lakehouse.manifestEntries(spark, root, v).collect {
        case (k, p, _) if k == "delete" || k == "cdelete" => s"$root/$p"
      }
      if (paths.isEmpty) (0L, 0L)
      else (spark.read.parquet(paths: _*).count(),
        paths.map(p => fs.getFileStatus(
          new org.apache.hadoop.fs.Path(p)).getLen).sum)
    }
    def deletePlans(root: String, v: Int): (Long, Int, Double) = {
      def one(): (Long, Int, Double) = {
        val df = Lakehouse.readVersion(spark, root, v, "o_orderkey")
        val t0 = System.nanoTime()
        val n = df.count()
        val t = (System.nanoTime() - t0) / 1e9
        val planned = graft.PlanScans
          .collect(df.queryExecution.executedPlan)
          .flatMap(_.relation.location.inputFiles)
          .count(_.contains("/deletes/"))
        (n, planned, t)
      }
      one(); val a = one(); val b = one()
      (a._1, a._2, math.min(a._3, b._3))
    }
    for (dd <- Seq(4, 8, 16)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_rent_rd$dd"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      // interleave: epoch ingest then a delete commit, D times — the
      // regime where every data batch sees a DIFFERENT delete horizon
      var v = 0
      for (i <- 0 until dd) {
        Lakehouse.ingestCommit(root,
          base.filter(pmod(col("o_orderkey"), lit(dd.toLong)) === i),
          v.toLong, "o_orderkey")
        v += 1
        v = Lakehouse.deleteCommit(spark, root, v,
          base.filter(pmod(col("o_orderkey"), lit(200L)) === i)
            .select("o_orderkey"))
      }
      val (nPre, plannedPre, tPre) = deletePlans(root, v)
      val (rowsPre, bytesPre) = delStorage(root, v)
      val (_, tRw) = time {
        v = Lakehouse.rewriteDeletes(spark, root, v, "o_orderkey") }
      val (nPost, plannedPost, tPost) = deletePlans(root, v)
      val (rowsPost, bytesPost) = delStorage(root, v)
      require(nPre == nPost, s"rewriteDeletes changed rows: $nPre != $nPost")
      println(f"D=$dd%-3d delScansPre=$plannedPre%4d " +
        f"delScansPost=$plannedPost%4d rewrite=$tRw%6.2fs " +
        f"readPre=$tPre%5.2fs readPost=$tPost%5.2fs rows=$nPre%7d " +
        f"delRowsPre=$rowsPre%7d delRowsPost=$rowsPost%8d " +
        f"(${rowsPost.toDouble / math.max(rowsPre, 1)}%5.1fx) " +
        f"delKBPre=${bytesPre / 1024}%6d delKBPost=${bytesPost / 1024}%7d")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    }
    spark.stop()
  }
}
