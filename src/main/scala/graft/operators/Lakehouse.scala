package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Snapshot-versioned table on plain parquet — the lakehouse table-format
  * pattern (Iceberg/Delta-style, re-derived from first principles on the
  * public Spark API): every commit writes IMMUTABLE data/delete files plus
  * a manifest that closes the file list for that version. Readers never
  * list data directories (object-store listing is slow and eventually
  * consistent at 100 TB — the original motivation for manifest-based
  * formats); time travel is "read manifest v"; snapshot isolation is free
  * because nothing a committed version references is ever mutated.
  *
  * Metadata is TWO-LEVEL (the Iceberg manifest-list shape): each commit
  * writes one immutable MANIFEST holding only the entries it ADDS, and a
  * SNAPSHOT (manifest list) naming every manifest whose entries the
  * version references — inherited manifests are reused by name, never
  * rewritten. A single-level scheme (each version re-listing every live
  * file) makes commit k cost O(total files at k), i.e. quadratic metadata
  * over the table's life; here commit cost is O(files added) + an
  * O(#manifests) list row per live manifest, independent of table size.
  *
  * Layout under a table root:
  * {{{
  *   data/w=[writeId]/part-….parquet      immutable data files
  *   deletes/w=[writeId]/part-….parquet   delete-key files (merge-on-read)
  *   _manifests/m=[v]-[uuid]/….parquet    one commit's ADDED entries:
  *                                        (kind, path, seq) — immutable
  *   _snapshots/v=[version]/….parquet     manifest list: (mpath) rows
  *                                        closing the version's file set
  * }}}
  * All stored paths are RELATIVE to the root (the table can move
  * wholesale). `_…`/`.…` names are invisible to Spark's discovery, so a
  * reader pointed at the root never sees bookkeeping as data.
  *
  * Scale contract, per operation:
  *   - COMMIT writes one manifest (O(files ADDED) rows) + one snapshot
  *     (O(#live manifests) rows — one tiny row per manifest) + one
  *     rename, never a data copy and never a re-listing of inherited
  *     files. Publish is staging+rename of the SNAPSHOT only (atomic on
  *     HDFS/posix; an object store swaps the rename for its
  *     manifest-commit op).
  *   - READ collects only the manifest (file list — thousands of entries
  *     at 100 TB, metadata-scale) and hands Spark the exact file set; the
  *     parquet scan itself prunes columns/predicates as usual.
  *   - DELETE is merge-on-read: the commit writes one key row per deleted
  *     record and the reader anti-joins the (typically tiny, broadcast)
  *     delete set — no data file is rewritten. A bulk delete would drop
  *     the broadcast hint and let the anti-join shuffle.
  *   - COMPACT is copy-on-write: materialize the live view into fresh
  *     files and commit a manifest referencing only those — the readers
  *     of older versions are untouched (their files still exist).
  *
  *   - MERGE (upsert) is one merge-on-read commit: fresh data files + a
  *     delete file for the matched keys, sound under sequence scoping.
  *   - SCHEMA EVOLUTION is additive: a later commit's batch may carry
  *     new columns; readers null-fill older rows, nothing is rewritten.
  *   - VACUUM reclaims files unreferenced by any retained version —
  *     per-file metadata ops, never a data read.
  *
  * The declared keys gate every version state against a DuckDB replay
  * of the same predicates over the base table, the CDC key gates the
  * incremental read (new-files-only, never a snapshot diff), and
  * LakehouseSpec locks the metadata claims (delete commit leaves data
  * entries byte-identical; CDC reads only the appended files; commits
  * distinguish idempotent replay from concurrent conflict; a stranded
  * staging manifest recovers; vacuum reclaims exactly the garbage).
  */
object Lakehouse {

  // Manifest rows carry a SEQUENCE number (the version that first
  // committed the entry): a delete file masks only data files with a
  // STRICTLY SMALLER seq — the Iceberg-v2 sequence-number rule that
  // makes merge-on-read UPSERTs sound. Without it, a MERGE that
  // re-inserts a key it also deletes would anti-join its own new row
  // away; with it, the delete scopes to history and the fresh row
  // (same seq as the delete) survives.
  // Manifest rows: (kind string, path string, seq int); snapshot lists:
  // (mpath string) — read/written driver-side via MetaIO (same parquet
  // format Spark jobs wrote before; metadata is driver work).

  private def hadoopFs(s: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Recursively list the parquet files under `dir`, as paths relative to
    * `root`, sorted — the commit-time closure of a write's file set. */
  private[graft] def listDataFiles(s: SparkSession, root: String,
      dir: String): Seq[String] = {
    val fs = hadoopFs(s, dir)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    val rootPrefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val p = it.next().getPath.toUri.getPath
      if (p.endsWith(".parquet") || p.contains("/part-")) {
        require(p.startsWith(rootPrefix), s"file $p outside table root")
        if (!p.substring(rootPrefix.length).startsWith("_") &&
          !new org.apache.hadoop.fs.Path(p).getName.startsWith("_") &&
          !new org.apache.hadoop.fs.Path(p).getName.startsWith("."))
          buf += p.substring(rootPrefix.length)
      }
    }
    buf.toSeq.sorted
  }

  /** Two writers raced to the same version and the loser must NOT be
    * silently discarded — it holds different entries. Caller rebases on
    * the winner's manifest and retries at the next version (optimistic
    * concurrency, the Delta/Iceberg commit protocol). */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Publish version `v` as a SNAPSHOT whose file set = the entries of
    * `inherited` manifests (reused by name — never rewritten) plus a
    * fresh manifest holding exactly `added`. The commit's metadata cost
    * is O(|added|) manifest rows + O(#manifests) one-row-per-manifest
    * list rows — independent of the table's total file count (the
    * manifest-list shape; a version re-listing every live file would
    * make the k-th commit cost O(files at k), quadratic over the
    * table's life).
    *
    * The snapshot write goes to a PER-ATTEMPT dot-prefixed staging dir
    * (two racing writers must never share a staging path), attempts the
    * rename, then decides by READ-BACK of the RESOLVED ENTRIES:
    * whatever entries the target snapshot resolves to are the winner's,
    * regardless of the filesystem's rename-onto-existing-directory
    * semantics (LocalFS/HDFS move the source INTO an existing target
    * rather than failing — a returned `true` there does NOT mean we
    * won). Identical entries are the idempotent replay no-op (a crashed
    * run re-driven, a streaming epoch re-delivered); different entries
    * throw, because silently dropping the loser's entries would lose
    * its data — the caller rebases and retries at the next version.
    * On every non-winning exit the attempt's own manifest is reclaimed
    * (nothing references it); stray snapshot stagings — ours, a crashed
    * writer's, or one a rename fallback nested inside the target
    * (dot-prefixed, invisible to the snapshot read) — are swept. A
    * crash between manifest write and snapshot publish leaves an
    * unreferenced manifest; vacuum reclaims those. */
  private[graft] def publishVersion(s: SparkSession, root: String, v: Int,
      inherited: Seq[String], added: Seq[(String, String, Int)]): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = hadoopFs(s, root)
    val mine: Option[String] =
      if (added.isEmpty) None
      else {
        val name =
          s"m=$v-${java.util.UUID.randomUUID.toString.take(8)}"
        MetaIO.writeManifest(conf, s"$root/_manifests/$name", added)
        Some(s"_manifests/$name")
      }
    val list = (inherited ++ mine).sorted
    val intended = (readManifests(s, root, inherited) ++ added).sorted
    val target = s"$root/_snapshots/v=$v"
    val attempt = s".v=$v.staging.${java.util.UUID.randomUUID}"
    val staging = s"$root/_snapshots/$attempt"
    MetaIO.writeSnapshot(conf, staging, list)
    val tgt = new org.apache.hadoop.fs.Path(target)
    val stg = new org.apache.hadoop.fs.Path(staging)
    if (!fs.exists(tgt)) fs.rename(stg, tgt) // may race; read-back decides
    val winner = manifestEntries(s, root, v)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_snapshots"))
      .map(_.getPath).filter(_.getName.startsWith(s".v=$v.staging"))
      .foreach(fs.delete(_, true))
    fs.delete(new org.apache.hadoop.fs.Path(s"$target/$attempt"), true)
    if (winner != intended) {
      // lost race (or replayed with different content): our manifest is
      // unreferenced garbage — reclaim it before surfacing the conflict
      mine.foreach(m =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$m"), true))
      throw new ConcurrentCommitException(
        s"version $v already committed with different entries — " +
          "rebase on the published snapshot and retry at the next version")
    }
    // idempotent replay: entries matched but the published list names
    // the FIRST attempt's manifest — this attempt's duplicate is garbage
    val published = snapshotManifests(s, root, v).toSet
    mine.filterNot(published).foreach(m =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$m"), true))
  }

  /** Back-compat single-level shape (specs/tooling): publish `entries`
    * as a REWRITE snapshot (one fresh manifest, no inheritance). Same
    * read-back idempotency/conflict semantics as [[publishVersion]]. */
  private[graft] def commitVersion(s: SparkSession, root: String, v: Int,
      entries: Seq[(String, String, Int)]): Unit =
    publishVersion(s, root, v, Seq.empty, entries)

  /** The manifest list of snapshot `v`: root-relative manifest dirs,
    * sorted. One tiny parquet read — O(#manifests) rows. The existence
    * guard turns a read of an EXPIRED version (retired by
    * [[expireSnapshots]]) into a crisp refusal instead of a raw
    * path-not-found from deep inside the parquet reader — the
    * time-travel-horizon contract every snapshot consumer (readVersion,
    * CDC spans, the streaming table source) inherits from here. */
  private[graft] def snapshotManifests(s: SparkSession, root: String,
      v: Int): Seq[String] = {
    require(versionExists(s, root, v),
      s"version $v of $root is expired or was never committed")
    MetaIO.readSnapshot(s.sparkContext.hadoopConfiguration,
      s"$root/_snapshots/v=$v").sorted
  }

  /** The entries of an explicit manifest set — the unit CDC and
    * metadata-diff reads work in (reading only CHANGED manifests is
    * what keeps those O(change)). */
  private[graft] def readManifests(s: SparkSession, root: String,
      mpaths: Seq[String]): Seq[(String, String, Int)] =
    if (mpaths.isEmpty) Seq.empty
    else MetaIO.readManifests(s.sparkContext.hadoopConfiguration,
      mpaths.map(p => s"$root/$p")).sorted

  /** The committed file set of version `v`: (kind, relative path, seq)
    * rows resolved through the manifest list. Two small parquet reads +
    * a file-count-bounded collect — metadata. */
  private[graft] def manifestEntries(s: SparkSession, root: String,
      v: Int): Seq[(String, String, Int)] =
    readManifests(s, root, snapshotManifests(s, root, v))

  /** Has version `v` been committed? One metadata existence check — the
    * txn-log idempotency test a streaming committer runs before doing
    * ANY work for a re-delivered epoch (the data files a committed
    * snapshot references must never be rewritten). */
  private[graft] def versionExists(s: SparkSession, root: String,
      v: Int): Boolean =
    hadoopFs(s, root).exists(
      new org.apache.hadoop.fs.Path(s"$root/_snapshots/v=$v"))

  /** Driver-side commit ops (delete/compact/merge) are NOT replayable
    * the way epoch-identified streaming commits are: the data a
    * replayed run would stage can differ from what the committed
    * version references. Fail fast, before any data is written; the
    * caller rebases on latestVersion. (Streaming ingest/merge replay
    * safely via their versionExists-FIRST epoch check instead.) This
    * check is advisory — the RACE between two drivers passing it
    * simultaneously is closed structurally: every attempt writes to
    * its own UUID-suffixed directory (below), so racing writers never
    * share a write path and the publish read-back alone decides; the
    * loser's staged files are unreferenced orphans vacuum reclaims
    * after the grace window. */
  private def requireUncommitted(s: SparkSession, root: String, v: Int,
      op: String): Unit =
    require(!versionExists(s, root, v),
      s"$op: version $v is already committed — driver-side commits are " +
        "not replayable; rebase on latestVersion and retry at the next " +
        "version")

  private def attemptTag(): String =
    java.util.UUID.randomUUID.toString.take(8)

  /** Merge-on-read DELETE as a commit: land the key rows, publish
    * snapshot fromV+1 = fromV's manifests (reused by name) + one new
    * manifest holding only the delete files. Touches no data file and
    * re-lists no inherited entry. Returns the new version. The write
    * dir is per-attempt (UUID-suffixed): two racing drivers from the
    * same fromV can never overwrite each other's staged files — the
    * loser's land as vacuum-reclaimable orphans. */
  private[graft] def deleteCommit(s: SparkSession, root: String,
      fromV: Int, keys: DataFrame): Int = {
    val v = fromV + 1
    requireUncommitted(s, root, v, "deleteCommit")
    val dir = s"$root/deletes/w=$v-${attemptTag()}"
    keys.coalesce(1).write.mode("overwrite").parquet(dir)
    publishVersion(s, root, v, snapshotManifests(s, root, fromV),
      listDataFiles(s, root, dir).map(("delete", _, v)))
    v
  }

  /** Root-relative (file path, row ordinal) attached to a file-source
    * scan — the coordinates POSITION deletes mask by. Relative paths
    * (not absolute URIs) so the masks stay valid across a hard-link
    * clone or a root move; `_metadata.row_index` is the physical
    * ordinal inside the parquet file, computed from row-group metadata
    * (stable under row-group pruning and task split boundaries). */
  private def withFilePos(root: String, df: DataFrame): DataFrame = {
    val rootPrefix =
      new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    df.withColumn("__gf",
        regexp_replace(col("_metadata.file_path"), "^file:(//)?", "")
          .substr(lit(rootPrefix.length + 1), lit(Int.MaxValue)))
      .withColumn("__gp", col("_metadata.row_index"))
  }

  /** Merge-on-read POSITION DELETE as a commit (the Iceberg-v2
    * position-delete / Delta deletion-vector shape): delete WHERE
    * `pred` by recording the (file, ordinal) coordinates of the live
    * rows the predicate matched — from the SAME scan that found them —
    * and landing those as a `pdelete` file. No key column is needed
    * (the cheap shape for point deletes on keyless or wide-key
    * tables), no data file is rewritten, and reads mask by an ordinal
    * anti-join scoped per file. Seq-scoping matches equality deletes
    * (a pdelete masks only files from strictly earlier commits; new
    * file paths are unique, so later files are untouched by
    * construction). Returns the new version. */
  private[graft] def positionalDeleteCommit(s: SparkSession, root: String,
      fromV: Int, pred: org.apache.spark.sql.Column,
      keyCol: String): Int = {
    val v = fromV + 1
    requireUncommitted(s, root, v, "positionalDeleteCommit")
    val positions =
      readEntries(s, root, manifestEntries(s, root, fromV), keyCol,
        keepPos = true)
      .filter(pred)
      .select(col("__gf").as("fpath"), col("__gp").as("pos"))
    val dir = s"$root/pdeletes/w=$v-${attemptTag()}"
    positions.coalesce(1).write.mode("overwrite").parquet(dir)
    publishVersion(s, root, v, snapshotManifests(s, root, fromV),
      listDataFiles(s, root, dir).map(("pdelete", _, v)))
    v
  }

  /** The rows a span's POSITION deletes removed, reconstructed by
    * joining the (file, ordinal) masks back onto the span's data files
    * — the CDC retraction feed for predicate-driven deletes (equality
    * deletes feed [[changedFiles]]'s key files; positional masks have
    * no keys, so the consumer resolves them through the file
    * coordinates instead). O(masks) join against only the files the
    * masks name. */
  private[graft] def positionalDeletedRows(s: SparkSession, root: String,
      fromV: Int, toV: Int): DataFrame = {
    val before = snapshotManifests(s, root, fromV).toSet
    val pdels = readManifests(s, root,
        snapshotManifests(s, root, toV).filterNot(before))
      .filter(_._3 > fromV)
      .collect { case ("pdelete", p, _) => s"$root/$p" }
    val masks = s.read.parquet(pdels: _*)
      .select(col("fpath").as("__gf"), col("pos").as("__gp"))
    val touched = masks.select("__gf").distinct()
      .collect().map(r => s"$root/${r.getString(0)}")
    withFilePos(root, s.read.parquet(touched.toIndexedSeq: _*))
      .join(broadcast(masks), Seq("__gf", "__gp"))
      .drop("__gf", "__gp")
  }

  /** Copy-on-write compaction as a commit: materialize fromV's live
    * view into fresh files (a per-attempt namespace no other writer
    * can collide with), publish a manifest referencing only those.
    * Returns the new version. The one data-sized lifecycle op, priced
    * explicitly.
    *
    * OPTIMISTIC under contention (maintenance must not starve on a
    * busy table): a lost race re-publishes the SAME compacted files —
    * re-stamped to seq = fromV, the snapshot whose live view they ARE —
    * plus the intervening commits' own entries verbatim. The re-stamp
    * is what keeps interleaved deletes sound: an intervening delete at
    * seq q > fromV masks data seq < q, so it keeps masking its keys
    * inside the compacted files exactly as it masked them in the files
    * compaction replaced; intervening data rows (seq > fromV) ride
    * above untouched. Carried entries are the set difference vs fromV's
    * manifest, so a racing rewrite-snapshot's removals are honored too. */
  private[graft] def compactCommit(s: SparkSession, root: String,
      fromV: Int, keyCol: String, nFiles: Int = 4,
      maxRetries: Int = 20): Int = {
    val v = fromV + 1
    val fromEnts = manifestEntries(s, root, fromV).toSet
    val dir = s"$root/data/w=compact$v-${attemptTag()}"
    readVersion(s, root, fromV, keyCol)
      .repartition(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    val stagedPaths = listDataFiles(s, root, dir)
    var base = fromV
    var attempts = 0
    while (true) {
      val tryV = base + 1
      // a REWRITE snapshot: one fresh manifest, no inherited list — the
      // merge-on-read debt and the manifest-count rent both reset here.
      // Staged files stamp seq = fromV on BOTH paths: they ARE fromV's
      // live view, so a CDC span from fromV (the cursor a downstream
      // consumer holds) sees the compaction as the row-invisible
      // maintenance commit it is — identically with or without a race
      val staged = stagedPaths.map(("data", _, fromV))
      val carried =
        if (base == fromV) Seq.empty
        else {
          val baseEnts = manifestEntries(s, root, base).toSet
          // an intervening commit that REPLACED fromV's data files (a
          // racing compaction / data rewrite) made this compaction's
          // staged view redundant — carrying both would double rows;
          // refuse and let the caller rebase (masks-only removals, e.g.
          // a racing rewrite_deletes swapping plain deletes for
          // cumulative ones, are fine: those masks are baked in)
          if (!fromEnts.filter(_._1 == "data").subsetOf(baseEnts))
            throw new ConcurrentCommitException(
              "compactCommit: an intervening commit rewrote the data " +
                "files this compaction materialized — rebase on " +
                "latestVersion and re-run")
          // an intervening POSITION delete masks (file, ordinal) pairs
          // of the files this compaction replaces — unlike an equality
          // delete it cannot re-mask the fresh files, so carrying it
          // would silently lose the delete: refuse and rebase
          if ((baseEnts -- fromEnts).exists(_._1 == "pdelete"))
            throw new ConcurrentCommitException(
              "compactCommit: an intervening position delete references " +
                "the files this compaction replaces — rebase on " +
                "latestVersion and re-run")
          (baseEnts -- fromEnts).toSeq
        }
      try {
        publishVersion(s, root, tryV, Seq.empty, staged ++ carried)
        return tryV
      } catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          val cur = latestVersion(s, root)
          if (cur <= base) throw e
          base = cur
      }
    }
    -1 // unreachable
  }

  /** Merge-on-read UPSERT as ONE commit (the MERGE shape): the updates
    * frame lands as fresh data files AND its keys land as a delete
    * file, both at sequence v — the delete masks every EARLIER version
    * of a matched key (seq < v) while the fresh rows (seq = v) survive
    * it. Matched keys are updated, unmatched keys are inserted, and no
    * existing data file is rewritten. Returns the new version. Both
    * write dirs are per-attempt (UUID-suffixed) — see [[deleteCommit]]. */
  private[graft] def mergeCommit(s: SparkSession, root: String,
      fromV: Int, updates: DataFrame, keyCol: String): Int = {
    val v = fromV + 1
    requireUncommitted(s, root, v, "mergeCommit")
    val tag = attemptTag()
    val dataDir = s"$root/data/w=merge$v-$tag"
    val delDir = s"$root/deletes/w=$v-$tag"
    // the fresh-rows landing and the key-file landing are independent
    // jobs over the same updates frame writing disjoint dirs — overlap
    // them (guide §2.6); the commit publishes only after both land
    val fData = scala.concurrent.Future {
      s.sparkContext.setJobDescription(s"mergeCommit v=$v: data")
      try updates.repartition(2, col(keyCol))
        .write.mode("overwrite").parquet(dataDir)
      finally s.sparkContext.setJobDescription(null)
    }(stagePool)
    try updates.select(keyCol).coalesce(1).write.mode("overwrite")
      .parquet(delDir)
    finally scala.util.Try(scala.concurrent.Await.result(
      fData, scala.concurrent.duration.Duration.Inf))
    scala.concurrent.Await.result(fData,
      scala.concurrent.duration.Duration.Inf)
    publishVersion(s, root, v, snapshotManifests(s, root, fromV),
      listDataFiles(s, root, delDir).map(("delete", _, v)) ++
      listDataFiles(s, root, dataDir).map(("data", _, v)))
    v
  }

  /** OPTIMISTIC COMMIT LOOP — the Delta/Iceberg commit protocol on top
    * of [[publishVersion]]'s read-back conflict detection: stage once,
    * then try to publish on top of the current latest; on losing a
    * race, re-resolve the winner's manifest list, re-VALIDATE this
    * commit against the commits that landed in between
    * (`validate(fromV, curV)` — appends always pass; key-targeted ops
    * refuse on overlap), and re-publish at the next version with the
    * SAME staged files re-stamped to the new sequence. Two racing
    * writers thus both land, in a linear history, without either
    * re-running its data work; a genuine conflict still surfaces as
    * [[ConcurrentCommitException]] for a caller-level rebase (the
    * staged files are left for vacuum). */
  private[graft] def optimisticCommit(s: SparkSession, root: String,
      fromV: Int, staged: Seq[(String, String)],
      validate: (Int, Int) => Boolean, maxRetries: Int = 20): Int = {
    var base = fromV
    var attempts = 0
    while (true) {
      val v = base + 1
      try {
        // base 0 = the empty table (no snapshot exists to inherit)
        val inherited = if (base == 0) Seq.empty[String]
          else snapshotManifests(s, root, base)
        publishVersion(s, root, v, inherited,
          staged.map { case (k, p) => (k, p, v) })
        return v
      } catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          val cur = latestVersion(s, root)
          if (cur <= base || !validate(fromV, cur)) throw e
          base = cur
      }
    }
    -1 // unreachable
  }

  /** APPEND with optimistic retry: appends never conflict (fresh files,
    * no key is masked or rewritten), so a lost race just re-publishes
    * on the winner's snapshot. Returns the committed version. */
  private[graft] def appendCommitOptimistic(s: SparkSession, root: String,
      fromV: Int, batch: DataFrame, keyCol: String): Int = {
    val dir = s"$root/data/w=app-${attemptTag()}"
    batch.repartition(2, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    optimisticCommit(s, root, fromV,
      listDataFiles(s, root, dir).map(("data", _)), (_, _) => true)
  }

  /** Keyed DELETE with optimistic retry: a lost race re-validates that
    * no commit landed in between whose DELETE entries (plain or
    * cumulative — a MERGE's delete file counts) touch any of this
    * commit's keys; on overlap the retry REFUSES (the other writer may
    * have upserted a fresh row this delete would wrongly mask — the
    * caller must re-derive its keys against the new state), otherwise
    * it lands at the next version. Intervening appends never conflict
    * by default (SNAPSHOT-ISOLATION delete): the delete masks keys
    * wherever they live as of its own commit — standard DELETE
    * semantics. `strict = true` opts into the merge path's
    * SERIALIZABLE discipline: the retry also refuses when an
    * intervening commit ADDED data rows for one of this delete's keys
    * (the caller derived its keys from the base snapshot and never
    * observed the newer row, so re-stamping to a later seq would
    * silently mask it). */
  private[graft] def deleteCommitOptimistic(s: SparkSession, root: String,
      fromV: Int, keys: DataFrame, strict: Boolean = false): Int = {
    val dir = s"$root/deletes/w=opt-${attemptTag()}"
    keys.coalesce(1).write.mode("overwrite").parquet(dir)
    val keyName = keys.columns.head
    def noKeyOverlap(base: Int, cur: Int): Boolean = {
      val newEnts = readManifests(s, root,
        (snapshotManifests(s, root, cur).toSet --
          snapshotManifests(s, root, base).toSet).toSeq)
        .filter(_._3 > base)
      val checked = newEnts.collect {
        case (k, p, _) if k == "delete" || k == "cdelete" ||
          (strict && k == "data") => s"$root/$p"
      }
      checked.isEmpty ||
        s.read.parquet(dir).join(
          s.read.parquet(checked: _*).select(keyName),
          Seq(keyName), "left_semi").limit(1).count() == 0L
    }
    optimisticCommit(s, root, fromV,
      listDataFiles(s, root, dir).map(("delete", _)), noKeyOverlap)
  }

  /** Sequence-scoped MERGE with optimistic retry — SERIALIZABLE
    * validation (the strict Iceberg MERGE default): a lost race refuses
    * if any intervening commit either DELETED one of the merge's keys
    * (plain or cumulative entries — the upsert would resurrect it) or
    * ADDED data rows for one of them (the merge's update values were
    * computed against the stale base, so re-publishing would silently
    * clobber the newer row). Both checks read only the CHANGE (the
    * intervening commits' own files, key-projected), never the table.
    * Disjoint-key concurrency — the common case: two writers upserting
    * different key ranges — always lands; sequence scoping keeps the
    * merge sound at whatever version it finally publishes (its delete
    * file masks only seq < v, its fresh rows survive). */
  private[graft] def mergeCommitOptimistic(s: SparkSession, root: String,
      fromV: Int, updates: DataFrame, keyCol: String): Int = {
    val tag = attemptTag()
    val dataDir = s"$root/data/w=mergeopt-$tag"
    val delDir = s"$root/deletes/w=mergeopt-$tag"
    updates.repartition(2, col(keyCol))
      .write.mode("overwrite").parquet(dataDir)
    updates.select(keyCol).coalesce(1).write.mode("overwrite")
      .parquet(delDir)
    def noConflict(base: Int, cur: Int): Boolean = {
      val newEnts = readManifests(s, root,
        (snapshotManifests(s, root, cur).toSet --
          snapshotManifests(s, root, base).toSet).toSeq)
        .filter(_._3 > base)
      val keys = s.read.parquet(delDir)
      def overlaps(paths: Seq[String]): Boolean =
        paths.nonEmpty && keys.join(
          s.read.parquet(paths: _*).select(keyCol),
          Seq(keyCol), "left_semi").limit(1).count() > 0L
      !overlaps(newEnts.collect {
        case (k, p, _) if k == "delete" || k == "cdelete" => s"$root/$p"
      }) && !overlaps(newEnts.collect {
        case ("data", p, _) => s"$root/$p"
      })
    }
    optimisticCommit(s, root, fromV,
      listDataFiles(s, root, delDir).map(("delete", _)) ++
        listDataFiles(s, root, dataDir).map(("data", _)), noConflict)
  }

  /** One streaming micro-batch as an atomic version commit: epoch `id`
    * becomes version id+1. The idempotency check comes FIRST — a
    * re-delivered epoch whose manifest already published must skip the
    * data write too (the committed manifest references the first
    * attempt's file names; rewriting the directory would strand it) —
    * the transaction-log discipline streaming table sinks use. A crash
    * BETWEEN data write and manifest publish retries cleanly: overwrite
    * mode replaces the half-written directory, then the re-listed files
    * commit. */
  private[graft] def ingestCommit(root: String, batch: DataFrame,
      id: Long, keyCol: String): Unit = {
    val s = batch.sparkSession
    val v = id.toInt + 1
    if (versionExists(s, root, v)) return
    val dir = s"$root/data/w=$id"
    batch.repartition(2, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    val prev = if (v == 1) Seq.empty[String]
      else snapshotManifests(s, root, v - 1)
    publishVersion(s, root, v,
      prev, listDataFiles(s, root, dir).map(("data", _, v)))
  }

  /** One streaming micro-batch applied as an atomic MERGE commit —
    * the CDC-upsert ingest shape (each epoch carries full new rows for
    * updated AND inserted keys; sequence scoping makes the per-epoch
    * delete file mask only earlier versions of the matched keys). Same
    * transaction-log idempotency as [[ingestCommit]]: a re-delivered
    * epoch whose snapshot already published skips all work. */
  private[graft] def mergeIngestCommit(root: String, batch: DataFrame,
      id: Long, keyCol: String): Unit = {
    val s = batch.sparkSession
    if (versionExists(s, root, id.toInt + 1)) return
    mergeCommit(s, root, id.toInt, batch, keyCol): Unit
  }

  /** Default vacuum grace: an unreferenced file younger than this is
    * presumed to belong to an IN-FLIGHT commit and is left alone. */
  private[graft] val DefaultVacuumGraceMs: Long = 60L * 60L * 1000L

  /** VACUUM: physically delete every data/delete file not referenced by
    * any manifest version ≥ `retainFrom` (older files became garbage
    * when later commits stopped referencing them — compaction rewrites,
    * superseded deletes). Time travel to retained versions is
    * untouched; versions before the horizon become unreadable, which is
    * the documented trade every retention policy makes. Returns the
    * number of files reclaimed.
    *
    * `graceMs` is the concurrent-writer guard (the Iceberg
    * orphan-cleanup age cutoff): a writer stages its data files and its
    * manifest BEFORE its snapshot publishes, so for that window they
    * are unreferenced-but-live — an unconditional reclaim would delete
    * them and the writer would then publish a snapshot referencing
    * missing files. Only candidates whose mtime is at least `graceMs`
    * old are reclaimed (default one hour — far past any commit's
    * stage→publish gap); pass 0 only when the caller KNOWS no commit is
    * in flight (single-writer maintenance windows, tests).
    *
    * Scale shape: the referenced-set union is manifest metadata
    * (O(#files) driver work, no data read), the candidate list is one
    * recursive listing, and deletes are per-file metadata ops — vacuum
    * never reads a data byte. The retention guard is structural:
    * files referenced by ANY retained manifest are exempt, so a
    * concurrent reader of a retained version can never lose a file. */
  private[graft] def vacuum(s: SparkSession, root: String,
      retainFrom: Int, graceMs: Long = DefaultVacuumGraceMs): Int = {
    val fs = hadoopFs(s, root)
    val now = System.currentTimeMillis()
    def aged(st: org.apache.hadoop.fs.FileStatus): Boolean =
      now - st.getModificationTime >= graceMs
    // the retained set = every SURVIVING snapshot at or above the
    // horizon, plus any ref-pinned snapshot below it: expireSnapshots
    // may have retired versions inside the range (skip them — their
    // files are exactly what this vacuum reclaims), and a version a
    // named ref still points at (an audit tag, a lagging branch) keeps
    // its files regardless of the horizon — reclaiming under a live
    // ref would break the ref-log contract that a pointed-at snapshot
    // stays readable.
    val retainedManifests =
      ((retainFrom to latestVersion(s, root)) ++
        refHeads(s, root).filter(_ < retainFrom))
        .distinct.filter(versionExists(s, root, _))
        .flatMap(v => snapshotManifests(s, root, v)).distinct
    val retained =
      readManifests(s, root, retainedManifests).map(_._2).toSet
    val rootPrefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    var reclaimed = 0
    Seq("data", "deletes", "pdeletes").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          val f = st.getPath
          val rel = f.toUri.getPath.stripPrefix(rootPrefix)
          if (!retained(rel) && aged(st) && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) {
            fs.delete(f, false)
            reclaimed += 1
          }
        }
      }
    }
    // zone-map sidecars of write dirs with no retained file are dead
    // metadata — reclaim them with their data (sidecars don't count
    // toward the returned file total; they are bookkeeping, not table)
    val retainedTags = retained.collect {
      case p if p.startsWith("data/") => writeTag(p)
    }
    Seq("_stats", "_blooms", "_stats2").foreach { sub =>
      val sidecarRoot = new org.apache.hadoop.fs.Path(s"$root/$sub")
      if (fs.exists(sidecarRoot))
        fs.listStatus(sidecarRoot)
          .filter(st => !retainedTags(st.getPath.getName) && aged(st))
          .foreach(st => fs.delete(st.getPath, true))
    }
    // manifests no retained snapshot names are dead metadata too — the
    // pre-horizon versions' deltas and any orphan a writer stranded
    // between manifest write and snapshot publish (bookkeeping, not
    // counted toward the returned data-file total). The grace guard
    // matters MOST here: a concurrent writer's manifest is exactly
    // this shape between its write and its snapshot publish.
    val keepM = retainedManifests.toSet
    val mRoot = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    if (fs.exists(mRoot))
      fs.listStatus(mRoot)
        .filter(st => !keepM(s"_manifests/${st.getPath.getName}") &&
          aged(st))
        .foreach(st => fs.delete(st.getPath, true))
    reclaimed
  }

  /** SNAPSHOT EXPIRATION (the Iceberg `expire_snapshots` twin): retire
    * the snapshot METADATA of every version below `keepFrom`, bounding
    * the table's metadata growth over its life — without it, a table
    * committing every few minutes accumulates an unbounded version
    * history that every vacuum must walk and every `_snapshots`
    * listing must page through. Only the one-row-per-manifest snapshot
    * lists are removed here; manifests and data/delete files are
    * untouched (many are still referenced by surviving snapshots via
    * manifest reuse) — a FOLLOWING vacuum reclaims exactly the files
    * and manifests no surviving snapshot references, which is the
    * two-step Iceberg discipline (expire decides reachability, vacuum
    * does space).
    *
    * Two versions never expire regardless of the horizon:
    *   - the head (enforced: `keepFrom` ≤ latest), and
    *   - any version a named ref currently points at ([[refHeads]]) —
    *     an audit tag or lagging branch keeps its snapshot readable,
    *     exactly the branch/tag retention rule.
    * An expired version refuses time travel with a crisp error (the
    * [[snapshotManifests]] guard), and a CDC/feed span touching one
    * fails the same way — consumers must hold cursors within the
    * retention horizon, the contract streaming checkpoints rely on.
    * Returns the expired versions (ascending). Idempotent: a re-run
    * over the same horizon finds nothing left to expire. */
  private[graft] def expireSnapshots(s: SparkSession, root: String,
      keepFrom: Int): Seq[Int] = {
    val fs = hadoopFs(s, root)
    val latest = latestVersion(s, root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"expireSnapshots: keepFrom $keepFrom outside [1, $latest]")
    val pinned = refHeads(s, root)
    val expired = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$root/_snapshots"))
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .filter(v => v < keepFrom && !pinned(v)).sorted.toSeq
    expired.foreach { v =>
      fs.delete(
        new org.apache.hadoop.fs.Path(s"$root/_snapshots/v=$v"), true): Unit
    }
    expired
  }

  /** Metadata-only MANIFEST MERGE (the rewrite_manifests maintenance
    * op): coalesce version fromV's manifest list into ONE manifest
    * holding the same entries, published as fromV+1. No data or delete
    * file is touched and the read is row-identical; what changes is
    * the metadata rent — after E small commits the snapshot list holds
    * E manifests and every later commit pays an E-row list write, so
    * periodic manifest merge (or data compaction, which also resets to
    * one manifest) bounds that growth the way segment merge bounds the
    * BM25 index. Returns the new version.
    *
    * OPTIMISTIC under contention: the op is pure metadata with no
    * staged data work, so a lost race simply re-derives from the
    * winner's snapshot and re-publishes — a busy table can no longer
    * starve its own list-rent maintenance (every data commit used to
    * beat the fail-fast guard). */
  private[graft] def mergeManifests(s: SparkSession, root: String,
      fromV: Int, maxRetries: Int = 20): Int = {
    var base = fromV
    var attempts = 0
    while (true) {
      try {
        publishVersion(s, root, base + 1, Seq.empty,
          manifestEntries(s, root, base))
        return base + 1
      } catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          val cur = latestVersion(s, root)
          if (cur <= base) throw e
          base = cur
      }
    }
    -1 // unreachable
  }

  /** DELETE-FILE MAINTENANCE (rewrite_deletes — the manifest-merge
    * pattern at the delete level): bound [[readEntries]]'s O(D²)
    * delete planning by rewriting fromV's D live delete commits into
    * one CUMULATIVE key file per distinct delete sequence d, holding
    * every key deleted at any seq ≥ d. Cumulative files nest (M_d ⊇
    * M_d' for d < d'), so a data group anti-joins only its smallest
    * applicable one — per-group plan fan-out resets to ONE delete scan,
    * O(D) total, and the read is row-identical: the smallest cdelete
    * seq > q holds exactly {k : deleted at some seq > q}, the same set
    * the plain files union to (seqs are preserved, so scoping — a
    * merge's fresh rows surviving their own delete — is untouched).
    *
    * Data files are never read or moved: the op reads only the D key
    * files (one pass: per-key max delete seq, then one suffix filter
    * per distinct seq) and publishes a REWRITE snapshot with the data
    * entries verbatim. The superseded plain delete files become
    * unreferenced garbage for vacuum. No-op (returns fromV) when the
    * version has no delete entries. Returns the new version.
    *
    * OPTIMISTIC under contention (maintenance must not starve on a
    * busy table): a lost race re-publishes the SAME staged cumulative
    * files on top of the winner, carrying the intervening commits'
    * entries verbatim — sound because a post-rewrite plain delete
    * composes with the cumulative set (the smallest-applicable-file
    * read unions newer plain masks; LakehouseSpec's post-rewrite
    * compose lock). Two refusal cases surface as
    * [[ConcurrentCommitException]] for a caller rebase: an intervening
    * DELETE whose keys overlap the rewritten span (the cumulative
    * nesting invariant M_d ⊇ M_d' no longer covers that key's true max
    * seq — a re-run from the new base folds it in exactly), and an
    * intervening commit that REPLACED fromV's data files (a racing
    * compaction already reset the delete debt this rewrite was
    * bounding). */
  private[graft] def rewriteDeletes(s: SparkSession, root: String,
      fromV: Int, keyCol: String, maxRetries: Int = 20): Int = {
    val ents = manifestEntries(s, root, fromV)
    // prior cdelete files fold in exactly: a key appears in every
    // cumulative file at seq ≤ its true max delete seq, so max over
    // containing-file seqs reproduces maxDseq — re-rewriting after new
    // deletes is sound
    val delBySeq = ents.collect {
      case (k, p, q) if k == "delete" || k == "cdelete" =>
        (q, s"$root/$p")
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    if (delBySeq.isEmpty) return fromV
    val v = fromV + 1
    // per-key MAX delete seq: k belongs to cumulative file M_d iff it
    // was deleted at any seq >= d iff max(its delete seqs) >= d — one
    // aggregation over the D key files, then one filter+write per seq
    val keyed = delBySeq.toSeq.map { case (q, paths) =>
      s.read.parquet(paths: _*).select(col(keyCol))
        .withColumn("__dseq", lit(q))
    }.reduce(_.unionByName(_))
      .groupBy(keyCol).agg(max(col("__dseq")).as("__mx"))
      .localCheckpoint()
    val tag = attemptTag()
    val cumEntries = delBySeq.keys.toSeq.sorted.flatMap { d =>
      val dir = s"$root/deletes/w=rd$v-$tag/d=$d"
      keyed.filter(col("__mx") >= d).select(keyCol)
        .coalesce(1).write.mode("overwrite").parquet(dir)
      listDataFiles(s, root, dir).map(("cdelete", _, d))
    }
    val fromEnts = ents.toSet
    var base = fromV
    var attempts = 0
    while (true) {
      val carried =
        if (base == fromV) Seq.empty
        else {
          val baseEnts = manifestEntries(s, root, base).toSet
          if (!fromEnts.filter(_._1 == "data").subsetOf(baseEnts))
            throw new ConcurrentCommitException(
              "rewriteDeletes: an intervening commit rewrote the data " +
                "files — rebase on latestVersion and re-run")
          val inter = (baseEnts -- fromEnts).toSeq
          val interDel = inter.collect {
            case (k, p, _) if k == "delete" || k == "cdelete" =>
              s"$root/$p"
          }
          if (interDel.nonEmpty &&
            keyed.select(keyCol).join(
              s.read.parquet(interDel: _*).select(keyCol),
              Seq(keyCol), "left_semi").limit(1).count() > 0L)
            throw new ConcurrentCommitException(
              "rewriteDeletes: an intervening delete overlaps the " +
                "rewritten span's keys — rebase on latestVersion and " +
                "re-run the rewrite so the new mask folds in")
          inter
        }
      try {
        // position masks carry VERBATIM: they have no keys to fold
        // into the cumulative files, and they stay valid because the
        // data entries they reference are republished unchanged
        publishVersion(s, root, base + 1, Seq.empty,
          ents.filter(e => e._1 == "data" || e._1 == "pdelete") ++
            cumEntries ++ carried)
        return base + 1
      } catch {
        case e: ConcurrentCommitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          val cur = latestVersion(s, root)
          if (cur <= base) throw e
          base = cur
      }
    }
    -1 // unreachable
  }

  // --- AUTO-MAINTENANCE: a metrics-driven planner over the three
  // maintenance ops (the Delta auto-optimize / Iceberg
  // maintenance-policy pattern). A table that is WRITTEN well still
  // degrades structurally — delete debt grows the read's anti-join
  // fan-out, manifest count grows every commit's list rent, small
  // files grow the scan's open cost — and a deployment cannot hand
  // schedule per-table ops across thousands of tables. The planner
  // reads ONLY table metadata, compares against a policy, and runs
  // exactly the ops the metrics justify; every op is row-invisible, so
  // the whole pass is too (the declared key's oracle). ---

  /** Structural health of version `v`, all from metadata: live
    * manifest count (commit list rent), distinct PLAIN delete-commit
    * count (read fan-out debt — cumulative files from a prior rewrite
    * are already-paid maintenance and don't count), data-file count
    * and how many fall under the small-file bound. File sizes come
    * from per-file metadata calls here; a production manifest schema
    * records byte sizes in the entries themselves (as
    * Iceberg/Delta do), making this a pure manifest read. */
  final case class TableMetrics(manifests: Int, deleteCommits: Int,
      dataFiles: Int, smallDataFiles: Int, dataBytes: Long)

  private[graft] def tableMetrics(s: SparkSession, root: String, v: Int,
      smallBytes: Long): TableMetrics = {
    val ms = snapshotManifests(s, root, v)
    val ents = readManifests(s, root, ms)
    val fs = hadoopFs(s, root)
    val sizes = ents.collect { case ("data", p, _) =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/$p")).getLen
    }
    TableMetrics(
      manifests = ms.size,
      deleteCommits =
        ents.collect { case ("delete", _, q) => q }.distinct.size,
      dataFiles = sizes.size,
      smallDataFiles = sizes.count(_ < smallBytes),
      dataBytes = sizes.sum)
  }

  /** The deployment's knobs: when does each structural debt warrant
    * its op, what is "small", and what file size compaction targets. */
  final case class MaintenancePolicy(
      maxDeleteCommits: Int = 2,
      maxManifests: Int = 4,
      maxSmallFiles: Int = 8,
      smallBytes: Long = 1L << 20,
      targetFileBytes: Long = 128L << 20)

  /** Evaluate the policy and run what the metrics justify, in
    * subsumption order: small-file COMPACTION first (a copy-on-write
    * rewrite also retires every delete and resets the manifest list,
    * so re-measured metrics usually stop there), then DELETE REWRITE
    * (O(D²)→O(D) read planning), then MANIFEST MERGE (list rent).
    * Metrics re-measure after each op — the planner never runs an op
    * whose debt a previous op already cleared. A healthy table is a
    * metadata read and nothing else. Returns (head version, the ops
    * run, in order). Compaction sizes its output file count from
    * total live bytes / targetFileBytes — the bin-pack target; a
    * production planner compacts the small-file SUBSET per partition
    * rather than the whole table, same decision logic. */
  private[graft] def autoMaintain(s: SparkSession, root: String,
      fromV: Int, keyCol: String,
      policy: MaintenancePolicy = MaintenancePolicy())
      : (Int, Seq[String]) = {
    var v = fromV
    val acts = scala.collection.mutable.ArrayBuffer.empty[String]
    var m = tableMetrics(s, root, v, policy.smallBytes)
    if (m.smallDataFiles > policy.maxSmallFiles) {
      val nFiles = math.max(1, math.ceil(
        m.dataBytes.toDouble / policy.targetFileBytes).toInt)
      v = compactCommit(s, root, v, keyCol, nFiles)
      acts += "compact"
      m = tableMetrics(s, root, v, policy.smallBytes)
    }
    if (m.deleteCommits > policy.maxDeleteCommits) {
      v = rewriteDeletes(s, root, v, keyCol)
      acts += "rewriteDeletes"
      m = tableMetrics(s, root, v, policy.smallBytes)
    }
    if (m.manifests > policy.maxManifests) {
      v = mergeManifests(s, root, v)
      acts += "mergeManifests"
    }
    (v, acts.toSeq)
  }

  // --- named refs: mutable pointers into the immutable version
  // history (branches/tags). A ref is an APPEND-ONLY LOG under
  // _refs/<name>/r=<k>, each entry one tiny parquet dir holding a
  // single (version) row; the current value is the highest k. Updates
  // stage+rename like snapshots (atomic; a stranded dot-prefixed
  // staging is invisible and swept), and read-back decides a race —
  // the loser retries at the next log index, so updates serialize
  // without locks. The log IS the audit history: write-audit-publish
  // and rollback are both just ref moves over immutable snapshots. ---

  /** The ref's log entries, (idx, version), ascending. Empty if the
    * ref was never set. One metadata listing + tiny parquet reads. */
  private[graft] def refLog(s: SparkSession, root: String,
      name: String): Seq[(Int, Int)] = {
    val fs = hadoopFs(s, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_refs/$name")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("r=")).map(_.stripPrefix("r=").toInt).sorted
      .map(k => k -> MetaIO.readVersionRow(
        s.sparkContext.hadoopConfiguration,
        s"$root/_refs/$name/r=$k")).toSeq
  }

  /** Point `name` at `version` (branch move / tag create / rollback —
    * a pure metadata write; the snapshot history is immutable under
    * it). Lost races retry at the next log index. */
  private[graft] def setRef(s: SparkSession, root: String, name: String,
      version: Int): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = hadoopFs(s, root)
    val dir = s"$root/_refs/$name"
    var done = false
    while (!done) {
      val k = refLog(s, root, name).lastOption.map(_._1).getOrElse(0) + 1
      val attempt = s".r=$k.staging.${java.util.UUID.randomUUID}"
      MetaIO.writeVersionRow(conf, s"$dir/$attempt", version)
      val tgt = new org.apache.hadoop.fs.Path(s"$dir/r=$k")
      if (!fs.exists(tgt))
        fs.rename(new org.apache.hadoop.fs.Path(s"$dir/$attempt"), tgt)
      // read-back decides; sweep our staging (and any rename-nested copy)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).filter(_.getName.startsWith(s".r=$k.staging"))
        .foreach(fs.delete(_, true))
      fs.delete(new org.apache.hadoop.fs.Path(s"$tgt/$attempt"), true)
      done = MetaIO.readVersionRow(conf, s"$dir/r=$k") == version
    }
  }

  /** The version `name` currently points at. */
  private[graft] def getRef(s: SparkSession, root: String,
      name: String): Int = refLog(s, root, name).last._2

  /** Every ref's CURRENT version — the pin set snapshot expiration and
    * vacuum honor. Only the HEAD of each ref log pins (the log's older
    * entries are audit history of where the ref used to point, not
    * live references — the Iceberg branch/tag retention rule). A ref
    * dir holding only stranded stagings (no committed r=k entry)
    * contributes nothing. One listing + one tiny read per ref. */
  private[graft] def refHeads(s: SparkSession, root: String): Set[Int] = {
    val fs = hadoopFs(s, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_refs")
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(!_.startsWith("."))
      .flatMap(n => refLog(s, root, n).lastOption.map(_._2)).toSet
  }

  /** WRITE-AUDIT-PUBLISH: audit the STAGED snapshot `v` (committed but
    * not yet referenced by `ref` — invisible to readers of the ref)
    * and fast-forward the ref only on a clean audit. The audit here is
    * the integrity pair every ingest gate needs — no null keys, no
    * duplicate live keys — computed over the staged snapshot's live
    * view (one scan, zone-map/partition-prunable at scale). Returns
    * whether the snapshot was published. A rejected snapshot stays in
    * history for forensics until vacuum reclaims it. */
  private[graft] def auditAndPublish(s: SparkSession, root: String,
      v: Int, ref: String, keyCol: String): Boolean = {
    val staged = readVersion(s, root, v, keyCol)
    val r = staged.agg(
      coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)), lit(0L))
        .as("nulls"),
      (count(lit(1)) - count_distinct(col(keyCol))).as("dups")).head()
    val ok = r.getLong(0) == 0L && r.getLong(1) == 0L
    if (ok) setRef(s, root, ref, v)
    ok
  }

  /** Commit timestamps for every SURVIVING snapshot, ascending by
    * version, made MONOTONIC by running-max (a copied tree or a
    * skewed writer clock must never make time travel non-monotone —
    * the same fix-up Delta applies to commit-file mtimes). The
    * timestamp source is the snapshot dir's mtime: commit time IS
    * publish time, no extra metadata write. */
  private[graft] def commitTimestamps(s: SparkSession,
      root: String): Seq[(Int, Long)] = {
    val fs = hadoopFs(s, root)
    val vs = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$root/_snapshots"))
      .filter(_.getPath.getName.startsWith("v="))
      .map(st => (st.getPath.getName.stripPrefix("v=").toInt,
        st.getModificationTime))
      .sortBy(_._1).toSeq
    var run = 0L
    vs.map { case (v, t) => run = math.max(run, t); (v, run) }
  }

  /** Timestamp time travel (`TIMESTAMP AS OF`): the newest surviving
    * snapshot committed at or before `ts`. Refuses a timestamp older
    * than the retention horizon (nothing to read there — the
    * expireSnapshots contract applied to time, not versions). */
  private[graft] def versionAsOf(s: SparkSession, root: String,
      ts: Long): Int = {
    val at = commitTimestamps(s, root).takeWhile(_._2 <= ts)
    require(at.nonEmpty,
      s"no snapshot at or before ts=$ts — before table creation or " +
        "past the retention horizon")
    at.last._1
  }

  /** AGE-based retention (`expire_snapshots(older_than => ts)`): expire
    * every snapshot strictly older than `ts`, keeping — as always —
    * the head and every ref-pinned version. Resolves the cutoff to a
    * version horizon and delegates to [[expireSnapshots]], so the two
    * policies (keep-last-N and keep-younger-than) share one
    * mechanism. */
  private[graft] def expireSnapshotsOlderThan(s: SparkSession,
      root: String, ts: Long): Seq[Int] = {
    val cts = commitTimestamps(s, root)
    val keepFrom = cts.find(_._2 >= ts).map(_._1)
      .getOrElse(latestVersion(s, root))
    expireSnapshots(s, root, keepFrom)
  }

  /** FAST-FORWARD merge of branch `from` into ref `to` (the Iceberg
    * `fast_forward` procedure): a pure metadata ref move, legal only
    * while `to` still sits at the branch's CREATION BASE — the first
    * entry of `from`'s ref log records where the branch forked, so
    * "has `to` moved since" needs no parent pointers. If `to`
    * advanced, the histories diverged and a blind move would DROP
    * `to`'s commits: refuse with [[ConcurrentCommitException]] and let
    * the caller rebase the branch (re-apply its commits atop the new
    * head — the commits are immutable snapshots, nothing is lost).
    * Returns the new head. Snapshot versions stay linear; PARENTAGE is
    * what branches (a snapshot is a closed file set, so the history is
    * free to be a DAG — the rollback-divergence property, extended to
    * named lines of work). */
  private[graft] def fastForward(s: SparkSession, root: String,
      to: String, from: String): Int = {
    val target = getRef(s, root, from)
    val base = refLog(s, root, from).head._2
    val cur = getRef(s, root, to)
    if (cur != base)
      throw new ConcurrentCommitException(
        s"fast-forward $to ← $from: $to moved off the branch base " +
          s"($base → $cur) — the histories diverged; rebase the branch " +
          "and retry")
    setRef(s, root, to, target)
    target
  }

  /** Highest committed version (spec/tooling helper — queries pass
    * explicit versions). Listing `_snapshots` is one metadata call. */
  private[graft] def latestVersion(s: SparkSession, root: String): Int = {
    val fs = hadoopFs(s, root)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_snapshots"))
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt).max
  }

  /** Time-travel read: the live rows of version `v`. The data scan reads
    * EXACTLY the manifest's file set; delete keys (if any) apply as a
    * broadcast anti-join on `keyCol`, SCOPED by sequence number — a
    * delete masks only data rows from strictly earlier commits, so a
    * merge-on-read upsert's fresh rows survive their own delete file.
    *
    * Plan fan-out is bounded by DELETE COMMITS, not by commits: data
    * files are grouped by which delete set applies to them (all files
    * with seq in the same gap between delete seqs share one group), so
    * a table with thousands of appends between deletes plans one scan +
    * one plain key anti-join per live delete commit + 1 — and deletes
    * themselves retire at the next compaction. Groups union BY NAME
    * with null-fill: SCHEMA EVOLUTION — a commit may add columns, and
    * rows from pre-evolution files surface them as null (the
    * additive-evolution contract; drops/renames are a rewrite by
    * policy). Identical schemas pay nothing. */
  def readVersion(s: SparkSession, root: String, v: Int,
      keyCol: String): DataFrame =
    readEntries(s, root, manifestEntries(s, root, v), keyCol)

  /** The seq-scoped group read over an explicit entry set — shared by
    * [[readVersion]] and [[readVersionPruned]] so range pruning can
    * never bypass the delete-scoping rules.
    *
    * Two delete-entry kinds participate:
    *   - "delete": one commit's keys, masking data with seq < its own —
    *     a group with k applicable delete commits anti-joins the union
    *     of their key files, so across groups each file is planned up
    *     to D times (O(D²) tiny key-file scans for D live delete
    *     commits; bounded by compaction cadence).
    *   - "cdelete" (from [[rewriteDeletes]]): CUMULATIVE — the file at
    *     seq d holds every key deleted at ANY seq ≥ d, so a data group
    *     needs only the SMALLEST applicable cdelete (it subsumes the
    *     later ones): per group ONE cdelete scan, O(D) total — the
    *     maintenance op's whole point.
    * The two compose (a plain delete commit can land after a rewrite):
    * a group's mask = union(applicable plain files) ∪ smallest
    * applicable cdelete. */
  private def readEntries(s: SparkSession, root: String,
      ents: Seq[(String, String, Int)], keyCol: String,
      keepPos: Boolean = false): DataFrame = {
    val delBySeq = ents.collect { case ("delete", p, q) => (q, s"$root/$p") }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cumBySeq = ents.collect { case ("cdelete", p, q) => (q, s"$root/$p") }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pdelBySeq =
      ents.collect { case ("pdelete", p, q) => (q, s"$root/$p") }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val delSeqs = delBySeq.keys.toSeq.sorted
    val cumSeqs = cumBySeq.keys.toSeq.sorted
    val pdelSeqs = pdelBySeq.keys.toSeq.sorted
    // group data files by the delete set that applies: (count of later
    // plain delete commits, smallest later cumulative seq, count of
    // later position-delete commits)
    val groups = ents.collect { case ("data", p, q) => (q, s"$root/$p") }
      .groupBy { case (q, _) =>
        (delSeqs.count(_ > q), cumSeqs.find(_ > q),
          pdelSeqs.count(_ > q)) }
      .toSeq.sortBy { case ((n, c, np), _) =>
        (n, c.getOrElse(Int.MaxValue), np) }
    // schema lives in the data files in this implementation, so a
    // version with no data entries has no derivable schema — fail with
    // the contract instead of an opaque empty.reduce
    require(groups.nonEmpty,
      "readVersion: version references no data files (fully-emptied " +
        "tables need a schema-bearing manifest, the documented " +
        "production extension)")
    groups.map { case ((nDels, firstCum, nPdels), files) =>
      // mergeSchema: one group may span pre- and post-evolution files.
      // At fixture scale this reads footers; a production table keeps
      // the schema id in the manifest row and groups by it instead.
      val raw = s.read.option("mergeSchema", "true")
        .parquet(files.map(_._2): _*)
      // POSITION masks first (they reference the physical files, so
      // they must see every physical row): attach (file, ordinal)
      // coordinates only when a mask applies or the caller asked for
      // them — the plain path stays a bare scan
      val applicablePos = pdelSeqs.takeRight(nPdels).flatMap(pdelBySeq)
      val data =
        if (applicablePos.isEmpty && !keepPos) raw
        else {
          val withPos = withFilePos(root, raw)
          if (applicablePos.isEmpty) withPos
          else withPos.join(
            broadcast(s.read.parquet(applicablePos: _*)
              .select(col("fpath").as("__gf"), col("pos").as("__gp"))),
            Seq("__gf", "__gp"), "left_anti")
        }
      val applicable =
        delSeqs.takeRight(nDels).flatMap(delBySeq) ++
          firstCum.toSeq.flatMap(cumBySeq)
      val masked =
        if (applicable.isEmpty) data
        else data.join(broadcast(s.read.parquet(applicable: _*)
          .select(keyCol)), Seq(keyCol), "left_anti")
      if (keepPos) masked else masked.drop("__gf", "__gp")
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Per-file key min/max recorded at commit time (one pass over the
    * freshly-written files, grouped by input_file_name) — the zone-map
    * sidecar (`_stats/w=tag`) that lets readers prune files from TABLE
    * METADATA before Spark ever plans the scan. */
  private[graft] def writeKeyStats(s: SparkSession, root: String,
      relDir: String, keyCol: String): Unit = {
    val tag = relDir.substring(relDir.lastIndexOf('/') + 1)
    val rootPrefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    s.read.parquet(s"$root/$relDir")
      .select(col(keyCol), input_file_name().as("__f"))
      .groupBy("__f")
      .agg(min(keyCol).as("kmin"), max(keyCol).as("kmax"))
      .select(
        // store root-relative paths — same portability rule as manifests
        regexp_replace(col("__f"), lit("^file:(//)?" + rootPrefix),
          lit("")).as("path"),
        col("kmin"), col("kmax"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_stats/$tag")
  }

  /** Zone maps for the data files version `v` references: (relative
    * path → (kmin, kmax)). Reads ONLY the stats sidecars of the write
    * dirs the version's manifest actually names — metadata scoped to
    * the version, never the table's whole stats history. */
  /** The write-dir tag of a data entry path: the FIRST segment under
    * `data/` — sidecars are keyed per write (`w=<tag>`), and a write
    * may nest hive partition dirs below it (the z-order demo's
    * quantile buckets, the partition-transform layout), so the file's
    * immediate parent is NOT the tag. */
  private def writeTag(p: String): String =
    p.stripPrefix("data/").takeWhile(_ != '/')

  private[graft] def keyStats(s: SparkSession, root: String,
      v: Int): Map[String, (Long, Long)] = {
    val fs = hadoopFs(s, root)
    val tags = manifestEntries(s, root, v)
      .collect { case ("data", p, _) => writeTag(p) }
      .distinct
    val present = tags.map(t => s"$root/_stats/$t")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (present.isEmpty) Map.empty
    else MetaIO.readKeyStats(s.sparkContext.hadoopConfiguration, present)
  }

  /** Range-pruned time-travel read: drop every data file whose recorded
    * [kmin, kmax] cannot intersect [lo, hi] BEFORE planning the scan —
    * file skipping from table metadata, the zone-map complement to
    * parquet's own row-group stats (which only help after the file is
    * opened). Files without stats are conservatively kept, one data
    * file survives as a schema carrier when everything prunes, the
    * shared seq-scoped group read applies the delete files (pruning can
    * never bypass delete scoping), and the exact predicate refines.
    * Result must equal the unpruned read + filter — the oracle states
    * that. */
  def readVersionPruned(s: SparkSession, root: String, v: Int,
      keyCol: String, lo: Long, hi: Long): DataFrame = {
    val stats = keyStats(s, root, v)
    val all = manifestEntries(s, root, v)
    val kept = all.filter {
      case ("data", p, _) =>
        stats.get(p).forall { case (kmin, kmax) => kmin <= hi && lo <= kmax }
      case _ => true
    }
    val ents =
      if (kept.exists(_._1 == "data")) kept
      else kept :+ all.find(_._1 == "data").getOrElse(
        throw new IllegalStateException(
          s"readVersionPruned: version $v has no data files"))
    readEntries(s, root, ents, keyCol)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** MULTI-COLUMN zone maps: per-file min/max for EACH of `cols`
    * (long-castable), one pass over the freshly-written files —
    * (path, cname, vmin, vmax) rows in a `_stats2/w=tag` sidecar. The
    * point of recording several dimensions is a MULTI-DIMENSIONALLY
    * clustered layout (z-order): hash or single-range clustering bounds
    * one column's range per file and leaves the others full-width;
    * interleaved-bit clustering bounds ALL recorded dimensions at once,
    * so conjunctive range predicates prune multiplicatively. */
  private[graft] def writeColStats(s: SparkSession, root: String,
      relDir: String, cols: Seq[String]): Unit = {
    val tag = relDir.substring(relDir.lastIndexOf('/') + 1)
    val rootPrefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c")))
    val perFile = s.read.parquet(s"$root/$relDir")
      .select(col("*"), input_file_name().as("__f"))
      .groupBy("__f")
      .agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      perFile.select(
        regexp_replace(col("__f"), lit("^file:(//)?" + rootPrefix),
          lit("")).as("path"),
        lit(c).as("cname"),
        col(s"__min_$c").as("vmin"), col(s"__max_$c").as("vmax"))
    }.reduce(_.unionAll(_))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_stats2/$tag")
  }

  /** The multi-column zone maps version `v`'s data files carry:
    * path → (cname → (vmin, vmax)). Metadata scoped to the version's
    * write dirs, like [[keyStats]]. */
  private[graft] def colStats(s: SparkSession, root: String,
      v: Int): Map[String, Map[String, (Long, Long)]] = {
    val fs = hadoopFs(s, root)
    val tags = manifestEntries(s, root, v)
      .collect { case ("data", p, _) => writeTag(p) }
      .distinct
    val present = tags.map(t => s"$root/_stats2/$t")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (present.isEmpty) Map.empty
    // an all-null (or non-long-castable) column records null min/max;
    // MetaIO drops those rows, leaving the file stats-less for that
    // column, which the pruner treats as conservative-keep
    else MetaIO.readColStats(s.sparkContext.hadoopConfiguration, present)
      .groupBy(_._1)
      .view.mapValues(_.map(r => r._2 -> ((r._3, r._4))).toMap)
      .toMap
  }

  /** CONJUNCTIVE multi-dimension pruned read: drop every data file
    * whose recorded ranges cannot intersect ALL of `preds`
    * ((column, lo, hi) triples) before planning the scan. Columns
    * without stats on a file are conservatively kept, one file
    * survives as a schema carrier, the shared seq-scoped group read
    * applies delete files, and the exact predicates refine — the
    * oracle states the plain conjunction. Over a z-ordered layout the
    * per-dimension survivors INTERSECT (each dimension's range is
    * bounded per file), which is the multiplicative skipping a
    * single-column clustering cannot give. */
  def readVersionPrunedCols(s: SparkSession, root: String, v: Int,
      keyCol: String, preds: Seq[(String, Long, Long)]): DataFrame = {
    val stats = colStats(s, root, v)
    val all = manifestEntries(s, root, v)
    val kept = all.filter {
      case ("data", p, _) =>
        preds.forall { case (c, lo, hi) =>
          stats.get(p).flatMap(_.get(c))
            .forall { case (vmin, vmax) => vmin <= hi && lo <= vmax }
        }
      case _ => true
    }
    val ents =
      if (kept.exists(_._1 == "data")) kept
      else kept :+ all.find(_._1 == "data").getOrElse(
        throw new IllegalStateException(
          s"readVersionPrunedCols: version $v has no data files"))
    preds.foldLeft(readEntries(s, root, ents, keyCol)) {
      case (df, (c, lo, hi)) => df.filter(col(c) >= lo && col(c) <= hi)
    }
  }

  /** Per-file BLOOM sidecar over a (typically non-clustered) lookup
    * column, recorded at commit time (`_blooms/w=tag`) — the EQUALITY
    * complement to the zone-map sidecar: zone maps skip files by RANGE
    * on the clustering key; blooms skip files by point predicate on any
    * other column, from TABLE METADATA, before the scan is planned.
    * Parquet's own column blooms only help after the file footer is
    * opened — at object-store scale the saved open round-trip is the
    * point. One distributed pass over the freshly-written files
    * (groupBy input_file_name), one fixed-size binary per file
    * (Spark's own mergeable BloomFilterAggregate). */
  private[graft] def writeBloomStats(s: SparkSession, root: String,
      relDir: String, lookupCol: String): Unit = {
    val tag = relDir.substring(relDir.lastIndexOf('/') + 1)
    val rootPrefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
    s.read.parquet(s"$root/$relDir")
      .select(col(lookupCol), input_file_name().as("__f"))
      .groupBy("__f")
      // hash the column AS LONG: the prober hashes a Long literal, and
      // Spark's xxhash64 yields different hashes for IntegerType vs
      // LongType — without the cast a non-Long lookup column would make
      // every probe miss and silently prune files with matching rows
      .agg(graft.functions.SketchFunctions
        .bloomAgg(xxhash64(col(lookupCol).cast("long")), 100000L)
        .as("bloom"))
      .select(
        regexp_replace(col("__f"), lit("^file:(//)?" + rootPrefix),
          lit("")).as("path"),
        col("bloom"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_blooms/$tag")
  }

  /** The sidecar probe as a DISTRIBUTED plan: (path, hit) — one row per
    * bloomed file, the serialized filter deserialized and tested
    * EXECUTOR-SIDE (BloomContainsValue), so the driver never
    * materializes a bloom byte: at a few hundred thousand files the
    * collected planning metadata is O(kept + covered) short strings,
    * not #files × ~90 KB of filter payload. The lookup value is hashed
    * by the same engine xxhash64 (over a Long) the sidecar writer used,
    * so writer and prober can never disagree on the hash. */
  private[graft] def bloomProbeFrame(s: SparkSession,
      sidecars: Seq[String], value: Long): DataFrame = {
    val hashed = s.range(1).select(xxhash64(lit(value))).head().getLong(0)
    s.read.parquet(sidecars: _*)
      .select(col("path"), graft.functions.SketchFunctions
        .bloomContainsValue(col("bloom"), hashed).as("hit"))
  }

  /** Point-lookup read via BLOOM FILE SKIPPING: probe each file's bloom
    * with the lookup value (a metadata-scale job over the sidecars the
    * version's manifest names — might_contain false ⇒ the file
    * definitely has no matching row), plan the scan over only the
    * surviving files, and refine with the exact predicate (bloom
    * positives may be false). The probe itself is a distributed job
    * ([[bloomProbeFrame]]) — the driver collects only (path, boolean)
    * planning rows, never the filters. Files without a sidecar are
    * conservatively kept; one file survives as a schema carrier when
    * everything prunes; the shared seq-scoped group read applies any
    * delete files. Result must equal the plain predicate — the oracle
    * states that. */
  def readVersionBloomLookup(s: SparkSession, root: String, v: Int,
      keyCol: String, lookupCol: String, value: Long): DataFrame = {
    val fs = hadoopFs(s, root)
    val all = manifestEntries(s, root, v)
    val tags = all.collect { case ("data", p, _) => writeTag(p) }
      .distinct
    val present = tags.map(t => s"$root/_blooms/$t")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val probed: Array[(String, Boolean)] =
      if (present.isEmpty) Array.empty
      else bloomProbeFrame(s, present, value).collect()
        .map(r => (r.getString(0), r.getBoolean(1)))
    val covered: Set[String] = probed.map(_._1).toSet
    val kept: Set[String] = probed.collect { case (p, true) => p }.toSet
    val keptEnts = all.filter {
      case ("data", p, _) => !covered(p) || kept(p)
      case _ => true
    }
    val ents =
      if (keptEnts.exists(_._1 == "data")) keptEnts
      else keptEnts :+ all.find(_._1 == "data").getOrElse(
        throw new IllegalStateException(
          s"readVersionBloomLookup: version $v has no data files"))
    readEntries(s, root, ents, keyCol)
      .filter(col(lookupCol) === value)
  }

  /** Incremental CDC read between two committed versions: the rows of
    * data files ADDED after `fromV` (inserts) and the keys of delete
    * files added after `fromV` (deletes). The diff runs at the
    * MANIFEST-LIST level — only manifests toV names that fromV does not
    * are even read (commits between the versions contributed exactly
    * those), so CDC metadata cost is O(change), and the data read then
    * scans only the changed files — a snapshot diff (read both
    * versions, except) would scan the table twice.
    *
    * The manifest-level diff alone over-reports across METADATA-ONLY
    * rewrites: mergeManifests / rewriteDeletes publish row-identical
    * states behind fresh manifests, so every live entry would look
    * "added" and a consumer applying the feed would duplicate the
    * table. The seq refinement closes that: publishVersion's invariant
    * is that entries first committed at version v carry seq = v, and
    * the rewrites PRESERVE original seqs — so `seq > fromV` keeps
    * exactly the entries commits after fromV actually introduced, at
    * zero extra reads (the filter runs on rows already in hand).
    *
    * A span CROSSING a delete rewrite must not lose the deletes whose
    * plain manifests the rewrite snapshot no longer lists: the
    * cumulative file at the SMALLEST surviving cdelete seq d holds
    * every key deleted at any seq ≥ d — after the seq filter, that is
    * exactly the span's delete set (later cumulative files are its
    * subsets and are skipped; plain delete commits after the rewrite
    * union in as usual). */
  private[graft] def changedFiles(s: SparkSession, root: String,
      fromV: Int, toV: Int): (Seq[String], Seq[String]) = {
    val before = snapshotManifests(s, root, fromV).toSet
    val added = readManifests(s, root,
      snapshotManifests(s, root, toV).filterNot(before))
      .filter(_._3 > fromV)
    val cdels = added.collect { case ("cdelete", p, q) => (q, s"$root/$p") }
    val firstCum =
      if (cdels.isEmpty) Seq.empty
      else { val d = cdels.map(_._1).min; cdels.filter(_._1 == d).map(_._2) }
    (added.collect { case ("data", p, _) => s"$root/$p" },
      added.collect { case ("delete", p, _) => s"$root/$p" } ++ firstCum)
  }

  // --- the staged demonstration table: six commits over orders ---
  // v1 base load (o_orderkey ≡ 0 mod 3), v2 append (≡ 1 mod 3), v3
  // merge-on-read delete of live keys ≡ 4 mod 10, v4 copy-on-write
  // compaction of the live view, v5 sequence-scoped MERGE upsert, v6
  // schema-evolved append. Built once per (app, sf dir) — every
  // read key time-travels over the same immutable commit history, the
  // lifecycle key re-runs the commits into a fresh root to keep the
  // write cost visible (the q_landing_partitioned discipline).
  private val stagedRoot = graft.AppCache[String]()

  /** The one orders projection every table key (and the streaming
    * ingest) shares — a single definition so the ingested schema and
    * the declared outputs cannot drift apart. */
  private[graft] val OrdersCols = Seq("o_orderkey", "o_custkey",
    "o_orderdate", "o_totalprice")

  /** The shared output shape: date formatted engine-stable, rows
    * ordered by key (the hash-compare determinism sort). */
  private[graft] def orderedOrdersRows(df: DataFrame): DataFrame =
    df.select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"))
      .orderBy("o_orderkey")

  /** Shared pool for overlapping INDEPENDENT staging writes inside one
    * lifecycle build (guide §2.6) — see [[graft.StagePool]]. */
  private def stagePool: scala.concurrent.ExecutionContext =
    graft.StagePool.ec

  private[graft] def buildVersionedOrders(s: SparkSession, d: String,
      root: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
    // The v1, v2 and v6 batch writes (and the v1/v2 zone-map sidecars)
    // derive from `orders` alone and land in disjoint dirs — independent
    // job chains, overlapped from the two-thread pool so one write's
    // task tail backfills with the next write's tasks (guide §2.6).
    // COMMITS stay strictly ordered on this thread: v2 inherits v1's
    // manifests, v6 inherits v5's, and publishVersion's read-back is
    // the only atomic decision point, exactly as before.
    def stage(w: Int, df: DataFrame, stats: Boolean): Future[Unit] =
      Future {
        s.sparkContext.setJobDescription(s"lakehouse: stage w=$w")
        try {
          df.write.mode("overwrite").parquet(s"$root/data/w=$w")
          if (stats) writeKeyStats(s, root, s"data/w=$w", "o_orderkey")
        } finally s.sparkContext.setJobDescription(null)
      }(stagePool)
    // v1: base load. repartition by key — at scale the layout choice
    // (here hash by key into 4 files) is the writer's, invisible to the
    // manifest contract.
    // base/append writes are RANGE-clustered on the key (the layout a
    // writer chooses when point/range reads matter) and record per-file
    // zone maps at commit time — what readVersionPruned skips with.
    val f1 = stage(1, orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .repartitionByRange(4, col("o_orderkey")), stats = true)
    // v2: append — the new snapshot reuses v1's manifest by name and
    // adds one manifest for the new files only (the append never
    // rewrites history, data OR metadata).
    val f2 = stage(2, orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
      .repartitionByRange(4, col("o_orderkey")), stats = true)
    // v6: SCHEMA-EVOLVED append batch (committed LAST, below) — the
    // batch itself depends on nothing but `orders`, so it stages now.
    val f6 = stage(6, orders.filter(pmod(col("o_orderkey"), lit(97)) === 5)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      .withColumn("o_channel",
        concat(lit("ch"), pmod(col("o_orderkey"), lit(3))))
      .repartition(2, col("o_orderkey")), stats = false)
    try {
      Await.result(f1, Duration.Inf)
      publishVersion(s, root, 1, Seq.empty,
        listDataFiles(s, root, s"$root/data/w=1").map(("data", _, 1)))
      Await.result(f2, Duration.Inf)
      publishVersion(s, root, 2, snapshotManifests(s, root, 1),
        listDataFiles(s, root, s"$root/data/w=2").map(("data", _, 2)))
    } catch {
      // never leave a staged write running behind a failed build —
      // await every future before surfacing the error (ADVICE r14)
      case e: Throwable =>
        Seq(f1, f2, f6).foreach(f =>
          scala.util.Try(Await.result(f, Duration.Inf)))
        throw e
    }
    try {
      // v3: merge-on-read delete — derive the keys from the LIVE view of
      // v2 (the shape a real DELETE WHERE takes), land one key row per
      // deleted record; the commit's own manifest holds ONLY the delete
      // files (data manifests inherited untouched).
      readVersion(s, root, 2, "o_orderkey")
        .filter(pmod(col("o_orderkey"), lit(10)) === 4)
        .select("o_orderkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/deletes/w=3")
      publishVersion(s, root, 3, snapshotManifests(s, root, 2),
        listDataFiles(s, root, s"$root/deletes/w=3").map(("delete", _, 3)))
      // v4: copy-on-write compaction — materialize v3's live view into
      // fresh files; the new snapshot references only the fresh manifest
      // (no delete entries left to merge at read time, manifest-count
      // rent reset). Older versions still read their own files.
      readVersion(s, root, 3, "o_orderkey")
        .repartition(2, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/data/w=4")
      publishVersion(s, root, 4, Seq.empty,
        listDataFiles(s, root, s"$root/data/w=4").map(("data", _, 4)))
      // v5: merge-on-read UPSERT — one commit both UPDATES the live keys
      // ≡ 0 (mod 7) (price +10) and INSERTS the never-loaded ≡ 2 (mod 3)
      // third of the table. Sequence scoping is what makes this sound:
      // the commit's delete file masks only seq<5 rows, so the fresh
      // rows it lands survive their own delete.
      val live = pmod(col("o_orderkey"), lit(3)) =!= 2 &&
        pmod(col("o_orderkey"), lit(10)) =!= 4
      val updates = orders
        .filter(pmod(col("o_orderkey"), lit(3)) === 2 ||
          (live && pmod(col("o_orderkey"), lit(7)) === 0))
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(3)) =!= 2,
            col("o_totalprice") + 10.0).otherwise(col("o_totalprice")))
      mergeCommit(s, root, 4, updates, "o_orderkey")
    } catch {
      case e: Throwable =>
        scala.util.Try(Await.result(f6, Duration.Inf))
        throw e
    }
    // v6: SCHEMA-EVOLVED append — the new batch carries a column the
    // table never had (o_channel), staged concurrently above. Nothing
    // is rewritten: the commit is an ordinary append, and readers of v6
    // surface pre-evolution rows with o_channel null (additive
    // evolution via name-based union).
    Await.result(f6, Duration.Inf)
    publishVersion(s, root, 6, snapshotManifests(s, root, 5),
      listDataFiles(s, root, s"$root/data/w=6").map(("data", _, 6)))
  }

  private[graft] def versionedOrdersRoot(s: SparkSession, d: String): String =
    stagedRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildVersionedOrders(s, d, root)
      root
    }

  // --- the position-delete demonstration table: v1 base load (all
  // orders), v2 merge-on-read EQUALITY delete (keys ≡ 4 mod 10), v3
  // merge-on-read POSITION delete (predicate o_custkey ≡ 2 mod 7,
  // coordinates recorded from the live scan of v2 — so both mask
  // kinds apply on one snapshot). Built once per (app, sf dir).
  private val stagedPosRoot = graft.AppCache[String]()

  private[graft] def positionalDemoRoot(s: SparkSession, d: String)
      : String =
    stagedPosRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_pd_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
      orders.repartition(4, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/data/w=1")
      publishVersion(s, root, 1, Seq.empty,
        listDataFiles(s, root, s"$root/data/w=1").map(("data", _, 1)))
      val v2 = deleteCommit(s, root, 1,
        readVersion(s, root, 1, "o_orderkey")
          .filter(pmod(col("o_orderkey"), lit(10)) === 4)
          .select("o_orderkey"))
      positionalDeleteCommit(s, root, v2,
        pmod(col("o_custkey"), lit(7L)) === 2, "o_orderkey"): Unit
      root
    }

  /** Mixed equality + position masking on one snapshot: the v3 read
    * must equal the plain two-predicate oracle — the position masks
    * remove exactly the predicate's rows, the equality mask composes
    * beside them, and no rewritten file exists anywhere. */
  val qTablePositionalDelete: (SparkSession, String) => DataFrame =
    (s, d) => {
      val root = positionalDemoRoot(s, d)
      orderedOrdersRows(readVersion(s, root, 3, "o_orderkey"))
    }

  // --- FIELD-ID schema evolution (the Iceberg field-id discipline):
  // every column carries a permanent numeric id in a per-version
  // schema log; data files store columns under the NAME current at
  // write time, and reads resolve physical names through the id — so
  // a RENAME is one metadata commit (no file touched, history stays
  // readable under both names), a DROP hides the field without
  // rewriting it, and a re-ADD under a dropped name allocates a NEW
  // id, so old data never resurrects under the new field. Name-based
  // union (readVersion) remains the additive-only fast path; this is
  // the full-evolution read beside it. ---

  /** The schema active AT version v: the newest `_schemalog/v=k ≤ v`
    * entry set, (field id, name, Spark SQL type), ordered by id. One
    * tiny parquet read. */
  private[graft] def schemaAt(s: SparkSession, root: String,
      v: Int): Seq[(Int, String, String)] = {
    val fs = hadoopFs(s, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_schemalog")
    val newest = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toInt)
      .filter(_ <= v).max
    MetaIO.readSchemaLog(s.sparkContext.hadoopConfiguration,
      Seq(s"$root/_schemalog/v=$newest")).sortBy(_._1)
  }

  private[graft] def writeSchemaLog(s: SparkSession, root: String, v: Int,
      fields: Seq[(Int, String, String)]): Unit =
    MetaIO.writeSchemaLog(s.sparkContext.hadoopConfiguration,
      s"$root/_schemalog/v=$v", fields)

  /** Metadata-only schema commit: publish fromV+1 with fromV's
    * manifests inherited untouched and the evolved schema logged.
    * `evolve` maps the active field list to the new one. */
  private def schemaCommit(s: SparkSession, root: String, fromV: Int,
      op: String)(evolve: Seq[(Int, String, String)] =>
        Seq[(Int, String, String)]): Int = {
    val v = fromV + 1
    requireUncommitted(s, root, v, op)
    writeSchemaLog(s, root, v, evolve(schemaAt(s, root, fromV)))
    publishVersion(s, root, v, snapshotManifests(s, root, fromV),
      Seq.empty)
    v
  }

  /** RENAME a column: the field keeps its id (and its data files),
    * only the name moves. Metadata-only. */
  private[graft] def renameColumn(s: SparkSession, root: String,
      fromV: Int, oldName: String, newName: String): Int =
    schemaCommit(s, root, fromV, "renameColumn") { cur =>
      require(cur.exists(_._2 == oldName),
        s"renameColumn: no column $oldName")
      require(!cur.exists(_._2 == newName),
        s"renameColumn: $newName already exists")
      cur.map { case (id, n, t) =>
        (id, if (n == oldName) newName else n, t) }
    }

  /** DROP a column: the id leaves the schema; files keep the bytes
    * (time travel before the drop still reads them) but no current or
    * future read surfaces them. Metadata-only. */
  private[graft] def dropColumn(s: SparkSession, root: String,
      fromV: Int, name: String): Int =
    schemaCommit(s, root, fromV, "dropColumn") { cur =>
      require(cur.exists(_._2 == name), s"dropColumn: no column $name")
      cur.filterNot(_._2 == name)
    }

  /** ADD a column under a FRESH id — one past the max EVER allocated
    * (scanned over the whole schema log, not just the current schema:
    * a dropped field may hold the current max, and reusing its id
    * would resurrect its data under the new name). Pre-existing rows
    * surface the field as null. Metadata-only. */
  private[graft] def addColumn(s: SparkSession, root: String,
      fromV: Int, name: String, dtype: String): Int = {
    val fs = hadoopFs(s, root)
    val allLogs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_schemalog"))
      .map(_.getPath.toString).filter(_.contains("v=")).toSeq
    val everMax = MetaIO.readSchemaLog(
      s.sparkContext.hadoopConfiguration, allLogs).map(_._1).max
    schemaCommit(s, root, fromV, "addColumn") { cur =>
      require(!cur.exists(_._2 == name), s"addColumn: $name exists")
      cur :+ ((everMax + 1, name, dtype))
    }
  }

  /** TYPE-WIDEN a column in place (int→bigint, float→double — the
    * writer-compatible promotions): the id and name stay, reads cast
    * old files up. Metadata-only. */
  private[graft] def widenColumn(s: SparkSession, root: String,
      fromV: Int, name: String, dtype: String): Int =
    schemaCommit(s, root, fromV, "widenColumn") { cur =>
      require(cur.exists(_._2 == name), s"widenColumn: no column $name")
      cur.map { case (id, n, t) =>
        (id, n, if (n == name) dtype else t) }
    }

  /** Field-id-resolved time-travel read: data files group by the
    * schema epoch they were written under (newest schemalog ≤ seq —
    * metadata already in hand, no footer reads), each group maps
    * physical name → field id → the name/type CURRENT at `v`, fields
    * dropped from the current schema vanish, current fields a group
    * predates null-fill, widened types cast up — then one
    * positionally-aligned union. Equality-delete masks compose after
    * resolution (keys resolve by id like any field). */
  private[graft] def readVersionByFieldId(s: SparkSession, root: String,
      v: Int, keyCol: String = ""): DataFrame = {
    val cur = schemaAt(s, root, v)
    val ents = manifestEntries(s, root, v)
    val logVs = {
      val fs = hadoopFs(s, root)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_schemalog"))
        .map(_.getPath.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt).sorted.toSeq
    }
    val delFiles = ents.collect { case ("delete", p, q) =>
      (q, s"$root/$p") }
    val groups = ents.collect { case ("data", p, q) => (q, s"$root/$p") }
      .groupBy { case (q, _) =>
        (logVs.filter(_ <= q).max, delFiles.count(_._1 > q)) }
      .toSeq.sortBy(_._1)
    groups.map { case ((sv, nDels), files) =>
      val writeSchema = schemaAt(s, root, sv)
      val byId = writeSchema.map(f => f._1 -> f._2).toMap
      val df = s.read.parquet(files.map(_._2): _*)
      val resolved = df.select(cur.map { case (id, cname, ctype) =>
        byId.get(id) match {
          case Some(wname) => col(wname).cast(ctype).as(cname)
          case None => lit(null).cast(ctype).as(cname)
        }
      }: _*)
      // seq-scoped equality masks, applied post-resolution by id
      val masks = delFiles.sortBy(_._1).takeRight(nDels).map(_._2)
      if (masks.isEmpty || keyCol.isEmpty) resolved
      else resolved.join(broadcast(s.read.parquet(masks: _*)
        .select(keyCol)), Seq(keyCol), "left_anti")
    }.reduce(_.unionByName(_))
  }

  // --- the schema-evolution demonstration table: v1 base load under
  // (o_orderkey, o_custkey, o_totalprice), v2 RENAME o_totalprice →
  // price, v3 append written under the new name, v4 DROP o_custkey,
  // v5 re-ADD o_custkey (fresh field id), v6 append carrying the new
  // field. Built once per (app, sf dir). ---
  private val stagedEvoRoot = graft.AppCache[String]()

  private[graft] def schemaEvoDemoRoot(s: SparkSession, d: String)
      : String =
    stagedEvoRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_se_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      def land(tag: String, df: DataFrame, seq: Int) = {
        df.repartition(2, col("o_orderkey"))
          .write.mode("overwrite").parquet(s"$root/data/w=$tag")
        listDataFiles(s, root, s"$root/data/w=$tag").map(("data", _, seq))
      }
      writeSchemaLog(s, root, 1, Seq((1, "o_orderkey", "bigint"),
        (2, "o_custkey", "bigint"), (3, "o_totalprice", "double")))
      publishVersion(s, root, 1, Seq.empty,
        land("1", orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), 1))
      val v2 = renameColumn(s, root, 1, "o_totalprice", "price")
      publishVersion(s, root, 3, snapshotManifests(s, root, v2),
        land("3", orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
          .withColumnRenamed("o_totalprice", "price"), 3))
      val v4 = dropColumn(s, root, 3, "o_custkey")
      val v5 = addColumn(s, root, v4, "o_custkey", "bigint")
      publishVersion(s, root, 6, snapshotManifests(s, root, v5),
        land("6", orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
          .withColumnRenamed("o_totalprice", "price")
          .withColumn("o_custkey", col("o_custkey") + lit(1000L))
          .select("o_orderkey", "price", "o_custkey"), 6))
      root
    }

  /** Field-id evolution end to end: rename (files readable under both
    * names across history), drop, and add-after-drop (fresh id — the
    * dropped field's data must NOT resurrect under the re-added name).
    * The v6 read must equal the oracle's plain CASE over orders. */
  val qTableSchemaRename: (SparkSession, String) => DataFrame =
    (s, d) => {
      val root = schemaEvoDemoRoot(s, d)
      readVersionByFieldId(s, root, 6)
        .select(col("o_orderkey"), col("price"), col("o_custkey"))
        .orderBy("o_orderkey")
    }

  // --- the refs demonstration table: an independent commit history
  // over orders exercising write-audit-publish and rollback. Version
  // numbers are linear; PARENTS branch (a snapshot is a closed file
  // set — it needs no parent pointer, so the history is free to be a
  // DAG):
  //   v1 base (%3==0)                          wap_main r1 → 1
  //   v2 append (%3==1) from v1; audit OK   →  wap_main r2 → 2
  //   v3 delete (%10==4) from v2               rb_main  r1 → 3
  //   rollback (pure ref move)                 rb_main  r2 → 2
  //   v4 append (%3==2) from v2 — DIVERGENT    rb_main  r3 → 4
  //   v5 bad append (duplicated keys) from v2; audit REJECTS —
  //      wap_main stays at 2, v5 stays in history for forensics
  private val refsRoot = graft.AppCache[String]()

  private[graft] def buildRefsDemo(s: SparkSession, d: String,
      root: String): Unit = {
    val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
    def land(tag: String, df: DataFrame,
        seq: Int): Seq[(String, String, Int)] = {
      df.repartition(2, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/data/w=$tag")
      listDataFiles(s, root, s"$root/data/w=$tag").map(("data", _, seq))
    }
    publishVersion(s, root, 1, Seq.empty,
      land("1", orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), 1))
    setRef(s, root, "wap_main", 1)
    // WAP: stage the append as v2 — committed, auditable, but readers
    // of wap_main still see v1 until the audit fast-forwards the ref
    publishVersion(s, root, 2, snapshotManifests(s, root, 1),
      land("2", orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), 2))
    require(auditAndPublish(s, root, 2, "wap_main", "o_orderkey"),
      "refs demo: the clean append must pass its audit")
    // rollback arc: delete commit on top of v2, then abandon it
    deleteCommit(s, root, 2,
      readVersion(s, root, 2, "o_orderkey")
        .filter(pmod(col("o_orderkey"), lit(10)) === 4)
        .select("o_orderkey"))
    setRef(s, root, "rb_main", 3)
    setRef(s, root, "rb_main", 2) // the rollback: a pure metadata move
    publishVersion(s, root, 4, snapshotManifests(s, root, 2),
      land("rb4", orders.filter(pmod(col("o_orderkey"), lit(3)) === 2), 4))
    setRef(s, root, "rb_main", 4)
    // WAP rejection: a batch that duplicates its own keys — staged as
    // v5, audited, refused; wap_main never moves
    val bad = orders.filter(pmod(col("o_orderkey"), lit(97)) === 5)
      .withColumn("o_orderkey", col("o_orderkey") + lit(20000000L))
    publishVersion(s, root, 5, snapshotManifests(s, root, 2),
      land("bad5", bad.unionAll(bad), 5))
    require(!auditAndPublish(s, root, 5, "wap_main", "o_orderkey"),
      "refs demo: the duplicate-key batch must fail its audit")
    // BRANCH arc: a named line of work forked from the published main
    // head — two commits land on `dev` (versions stay linear, the
    // commits inherit from the BRANCH head, never main's), main
    // readers stay isolated on the base, then the audited branch
    // fast-forwards main in one metadata move.
    setRef(s, root, "br_main", 2)
    setRef(s, root, "dev", 2) // branch creation: log entry 1 IS the base
    // dev commit 1 — merge-on-read delete derived from the BRANCH head
    readVersion(s, root, 2, "o_orderkey")
      .filter(pmod(col("o_orderkey"), lit(10)) === 4)
      .select("o_orderkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/deletes/w=b6")
    publishVersion(s, root, 6, snapshotManifests(s, root, 2),
      listDataFiles(s, root, s"$root/deletes/w=b6").map(("delete", _, 6)))
    setRef(s, root, "dev", 6)
    // dev commit 2 — append of the never-loaded third, keys offset so
    // the branch's new rows are self-evidently its own
    publishVersion(s, root, 7, snapshotManifests(s, root, 6),
      land("b7", orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
        .withColumn("o_orderkey", col("o_orderkey") + lit(30000000L)), 7))
    setRef(s, root, "dev", 7)
    // the merge: main is still at the branch base, so the audited
    // branch fast-forwards in one metadata move (the ref LOGS retain
    // every intermediate state the declared key reads back)
    require(fastForward(s, root, "br_main", "dev") == 7,
      "refs demo: the branch fast-forward must land on the dev head")
  }

  private[graft] def refsDemoRoot(s: SparkSession, d: String): String =
    refsRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_refs_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildRefsDemo(s, d, root)
      root
    }

  private def refStepStats(s: SparkSession, root: String, step: String,
      v: Int): DataFrame =
    readVersion(s, root, v, "o_orderkey")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .select(lit(step).as("step"), lit(v).as("version"),
        col("n_rows"), col("sum_price"))

  /** WRITE-AUDIT-PUBLISH over the versioned table: the staged snapshot
    * is invisible to main-ref readers until its audit passes (fast
    * forward = one metadata write), and a batch that fails the audit
    * never surfaces — main re-reads identical after the rejection.
    * Every step's state is read THROUGH the ref log. */
  val qTableWap: (SparkSession, String) => DataFrame = (s, d) => {
    val root = refsDemoRoot(s, d)
    val log = refLog(s, root, "wap_main").map(_._2)
    refStepStats(s, root, "01_base", log.head)
      .unionAll(refStepStats(s, root, "02_staged", 2))
      .unionAll(refStepStats(s, root, "03_main_after_publish", log(1)))
      .unionAll(refStepStats(s, root, "04_rejected_staged", 5))
      .unionAll(refStepStats(s, root, "05_main_after_reject",
        getRef(s, root, "wap_main")))
      .orderBy("step")
  }

  /** BRANCH workflow over the same immutable history: a named line of
    * work forked from the published main head — its commits inherit
    * from the BRANCH head (never main's), main readers stay isolated
    * on the base the whole time (step 04 re-reads main's pre-merge
    * value: identical to step 01 by construction, which is exactly
    * the isolation claim), and the audited branch lands on main as a
    * fast-forward ref move. Every step is read back through the ref
    * LOGS — the logs are the audit history. LakehouseSpec pins the
    * divergence refusal (main moved off the base → the merge throws
    * instead of dropping main's commits). */
  val qTableBranch: (SparkSession, String) => DataFrame = (s, d) => {
    val root = refsDemoRoot(s, d)
    val dev = refLog(s, root, "dev").map(_._2)
    val main = refLog(s, root, "br_main").map(_._2)
    refStepStats(s, root, "01_main_base", main.head)
      .unionAll(refStepStats(s, root, "02_branch_deleted", dev(1)))
      .unionAll(refStepStats(s, root, "03_branch_appended", dev(2)))
      .unionAll(refStepStats(s, root, "04_main_isolated", main.head))
      .unionAll(refStepStats(s, root, "05_main_after_ff", main.last))
      .orderBy("step")
  }

  /** ROLLBACK + divergent history: moving the ref back is a pure
    * metadata write (no data op), the next commit diverges from the
    * rolled-back snapshot, and the abandoned version stays readable
    * for time travel until vacuum's horizon passes it. */
  val qTableRollback: (SparkSession, String) => DataFrame = (s, d) => {
    val root = refsDemoRoot(s, d)
    val log = refLog(s, root, "rb_main").map(_._2)
    refStepStats(s, root, "01_deleted", log.head)
      .unionAll(refStepStats(s, root, "02_rolled_back", log(1)))
      .unionAll(refStepStats(s, root, "03_diverged",
        getRef(s, root, "rb_main")))
      .unionAll(refStepStats(s, root, "04_abandoned_readable", 3))
      .orderBy("step")
  }

  /** Metadata-only manifest merge on the six-commit table: v7 holds
    * v6's exact entries behind ONE manifest (rewrite_manifests), so
    * the read is row-identical — the oracle is v6's, shared by
    * reference — while the per-commit list rent resets. Idempotent on
    * replay (same entries → read-back no-op). */
  val qTableManifestMerge: (SparkSession, String) => DataFrame = (s, d) => {
    val root = versionedOrdersRoot(s, d)
    val v = mergeManifests(s, root, 6)
    readVersion(s, root, v, "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("o_channel"))
      .orderBy("o_orderkey")
  }

  // --- the bloom demonstration table: orders hash-clustered into 16
  // files BY THE LOOKUP COLUMN (the writer's layout when point reads
  // on o_custkey matter — every custkey's rows land in exactly one
  // file) with a per-file bloom sidecar committed alongside. Zone maps
  // are useless here by construction (hash layout ⇒ every file spans
  // the whole key range); the bloom is what skips.
  private val bloomDemoRoot = graft.AppCache[String]()

  private[graft] def buildBloomDemo(s: SparkSession, d: String,
      root: String): Unit = {
    Tables.orders(s, d).select(OrdersCols.map(col): _*)
      .repartition(16, col("o_custkey"))
      .write.mode("overwrite").parquet(s"$root/data/w=1")
    writeBloomStats(s, root, "data/w=1", "o_custkey")
    publishVersion(s, root, 1, Seq.empty,
      listDataFiles(s, root, s"$root/data/w=1").map(("data", _, 1)))
  }

  private[graft] def bloomDemoTable(s: SparkSession, d: String): String =
    bloomDemoRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_bloom_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildBloomDemo(s, d, root)
      root
    }

  // --- the delete-maintenance demonstration table: 2 ingest epochs,
  // then THREE delete commits (the D-growing regime compaction hasn't
  // caught up with), then rewriteDeletes — the read before and after
  // the maintenance must be identical, and the post-maintenance plan
  // anti-joins ONE cumulative file per group instead of a growing
  // union (LakehouseSpec locks the plan shape; the declared key takes
  // the live-state oracle over the post-maintenance version).
  private val rdDemoRoot = graft.AppCache[String]()

  /** The PRE-maintenance debt state (2 ingest epochs + 3 delete
    * commits, nothing rewritten) — shared by the rewriteDeletes demo
    * and the auto-maintenance planner's staged base. Returns the head
    * version. */
  private[graft] def buildDeleteDebtDemo(s: SparkSession, d: String,
      root: String): Int = {
    val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
    ingestCommit(root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), 0L,
      "o_orderkey")
    ingestCommit(root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), 1L,
      "o_orderkey")
    var v = 2
    Seq((10, 1), (7, 3), (13, 5)).foreach { case (m, r) =>
      v = deleteCommit(s, root, v,
        orders.filter(pmod(col("o_orderkey"), lit(m)) === r)
          .select("o_orderkey"))
    }
    v
  }

  private[graft] def buildRewriteDeletesDemo(s: SparkSession, d: String,
      root: String): Int =
    rewriteDeletes(s, root, buildDeleteDebtDemo(s, d, root), "o_orderkey")

  private[graft] def rewriteDeletesDemoRoot(s: SparkSession,
      d: String): String =
    rdDemoRoot.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_rd_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildRewriteDeletesDemo(s, d, root)
      root
    }

  /** Post-maintenance read: three delete commits rewritten into
    * cumulative per-seq key files, read via the one-cdelete-per-group
    * plan — must hash-match the plain live-state predicate over the
    * base table (the maintenance is metadata+key-file only and
    * row-identical by construction). */
  val qTableRewriteDeletes: (SparkSession, String) => DataFrame =
    (s, d) => {
      val root = rewriteDeletesDemoRoot(s, d)
      orderedOrdersRows(
        readVersion(s, root, latestVersion(s, root), "o_orderkey"))
    }

  // the auto-maintenance key's staged PRE-maintenance base (delete
  // debt outstanding) — each pass hard-links it and lets the PLANNER
  // decide what to run (the vacuum-key staging discipline)
  private val autoMaintainBase = graft.AppCache[String]()

  /** The planner end to end: clone the delete-debt table, run
    * [[autoMaintain]] under a policy whose small-file bound is
    * disabled (the sf-scaled demo files are all tiny — size-triggered
    * compaction is the spec's scenario, not this key's), and read the
    * resulting head. The metrics justify exactly the delete rewrite
    * here (3 plain delete commits > 2; the rewrite snapshot resets the
    * manifest list, so the merge stage finds nothing) — and the whole
    * pass must be row-invisible: the read hash-matches the live-state
    * predicate, the q_table_rewrite_deletes oracle BY REFERENCE.
    * LakehouseSpec pins the DECISIONS per scenario: rewrite-only
    * here, merge-only on an append-heavy table, compact-first on a
    * small-file table (re-measured metrics stopping the later
    * stages), and all-quiet on a healthy one. */
  val qTableAutoMaintain: (SparkSession, String) => DataFrame =
    (s, d) => {
      val base = autoMaintainBase.get(s, d)({
        val r = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_amb_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(d.hashCode)
        buildDeleteDebtDemo(s, d, r): Unit
        r
      })
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_am_" +
        s.sparkContext.applicationId + "_" +
        lifecycleRuns.incrementAndGet()
      hardLinkTree(base, root,
        Seq("_snapshots", "_manifests", "data", "deletes"))
      val (v, _) = autoMaintain(s, root, latestVersion(s, root),
        "o_orderkey",
        MaintenancePolicy(maxSmallFiles = Int.MaxValue))
      val out = orderedOrdersRows(readVersion(s, root, v, "o_orderkey"))
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      out
    }

  /** CDC across the delete maintenance: the span v2 → post-rewrite
    * must report the three delete commits' keys even though the
    * rewrite snapshot no longer lists their plain manifests — the
    * smallest surviving cumulative file IS the span's delete set
    * (distinct keys by the rewrite's own aggregation). Hash-gated by
    * the union-of-predicates oracle. */
  val qTableCdcMaintained: (SparkSession, String) => DataFrame =
    (s, d) => {
      val root = rewriteDeletesDemoRoot(s, d)
      val (ins, dels) = changedFiles(s, root, 2,
        latestVersion(s, root))
      require(ins.isEmpty,
        "the maintenance span added no data files — CDC must agree")
      s.read.parquet(dels: _*)
        .select(lit("D").as("op"), col("o_orderkey"))
        .orderBy("o_orderkey")
    }

  /** Point lookup on the non-clustering column via bloom file skipping:
    * the hash layout routes each custkey to one file, the bloom probe
    * keeps that file (plus any false positives) out of 16, and the
    * exact predicate refines — must hash-match the plain predicate over
    * the base table (LakehouseSpec locks the scanned-file subset). */
  val qTableBloomLookup: (SparkSession, String) => DataFrame = (s, d) =>
    orderedOrdersRows(readVersionBloomLookup(
      s, bloomDemoTable(s, d), 1, "o_orderkey", "o_custkey", 5L))

  // --- the z-order demonstration table: orders clustered by the
  // INTERLEAVED BITS of (o_orderkey, o_custkey) into 16 range-split
  // files, with BOTH columns' per-file zone maps committed alongside.
  // A single-column range layout bounds one dimension and leaves the
  // other full-width per file; interleaving bounds both, so a
  // conjunctive 2-D range predicate prunes multiplicatively — the
  // reason multi-dimensional clustering exists.
  private val zorderDemoRootCache = graft.AppCache[String]()

  private[graft] def buildZorderDemo(s: SparkSession, d: String,
      root: String): Unit = {
    val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
    val r = orders.agg(
      min("o_orderkey").as("kmin"), max("o_orderkey").as("kmax"),
      min("o_custkey").as("cmin"), max("o_custkey").as("cmax"))
    val z = graft.functions.ScalePatterns.zValue(
      expr("(o_orderkey - kmin) * 65536 div (kmax - kmin + 1)"),
      expr("(o_custkey - cmin) * 65536 div (cmax - cmin + 1)"))
    // DETERMINISTIC 16-quantile split of the z values via the EXACT
    // `percentile` aggregate: its value→count map merges commutatively,
    // so the boundaries are identical on any partitioning/core count —
    // unlike repartitionByRange, whose sampling seed derives from the
    // session-global RDD id (boundaries wobble per session; the
    // round-13 q_table_pruned_read_zorder digest flap), and unlike the
    // previous ntile-over-a-global-Window pass, which moved the WHOLE
    // table through one task (WindowExec "No Partition Defined" — a
    // guaranteed OOM/straggler at scale, guide §2.5/§5). Rows are then
    // range-ASSIGNED by comparison against the 15 broadcast boundaries:
    // no global sort anywhere, and the assignment is row-order
    // independent. A production clustering job derives the same
    // boundaries from approxQuantile at fixed accuracy.
    val zd = orders.crossJoin(broadcast(r)).withColumn("__z", z)
    val bounds = zd.agg(expr(
        s"percentile(__z, array(${(1 to 15).map(_ / 16.0).mkString(",")}))"))
      .head().getSeq[Double](0)
    val bucket = bounds.foldLeft(lit(1))((acc, b) =>
      acc + when(col("__z") > lit(b), 1).otherwise(0))
    zd.withColumn("__b", bucket)
      .repartition(col("__b"))
      .select((OrdersCols.map(col) :+ col("__b")): _*)
      .write.partitionBy("__b").mode("overwrite")
      .parquet(s"$root/data/w=1")
    writeColStats(s, root, "data/w=1",
      Seq("o_orderkey", "o_custkey"))
    publishVersion(s, root, 1, Seq.empty,
      listDataFiles(s, root, s"$root/data/w=1").map(("data", _, 1)))
  }

  private[graft] def zorderDemoTable(s: SparkSession, d: String): String =
    zorderDemoRootCache.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_z_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildZorderDemo(s, d, root)
      root
    }

  /** 2-D range read via multi-column zone maps over the z-ordered
    * layout: both predicates prune files from table metadata before
    * the scan is planned, and the survivors are the files whose
    * interleaved-bit range straddles the query box — must hash-match
    * the plain conjunction over the base table (LakehouseSpec locks
    * that 2-D pruning scans strictly fewer files than either
    * single-dimension pruning alone). */
  val qTablePrunedReadZorder: (SparkSession, String) => DataFrame =
    (s, d) =>
      orderedOrdersRows(readVersionPrunedCols(
        s, zorderDemoTable(s, d), 1, "o_orderkey",
        Seq(("o_orderkey", 1000L, 4999L), ("o_custkey", 100L, 399L))))

  // --- PARTITION TRANSFORMS (Iceberg-style partition specs): a spec
  // is a (transform, column) pair recorded in the table's _specs log; a
  // partitioned append derives each row's partition VALUE from the
  // spec's transform, lands files hive-style under
  // data/w=<tag>/ps=<specId>/pv=<value>/, and the manifest entries
  // carry those paths — so every file's partition value is TABLE
  // METADATA, prunable at plan time with zero file opens, composing
  // with time travel, CDC, merge-on-read deletes and vacuum exactly
  // like any other entry. SPEC EVOLUTION is a new spec id: old files
  // keep their recorded granularity, new commits write the new one, and
  // the pruned read evaluates each file under the spec its own path
  // names — the Iceberg per-file-spec-id discipline without a manifest
  // schema change. At 100 TB this is the primary skip mechanism for
  // time-scoped queries (zone maps and blooms refine within the
  // surviving partitions).

  private[graft] def addPartitionSpec(s: SparkSession, root: String,
      id: Int, transform: String, column: String): Unit =
    MetaIO.writeSpec(s.sparkContext.hadoopConfiguration,
      s"$root/_specs/s=$id", transform, column)

  private[graft] def partitionSpecs(s: SparkSession, root: String)
      : Map[Int, (String, String)] = {
    val fs = hadoopFs(s, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_specs")
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("s=")).map(_.stripPrefix("s=").toInt)
      .map { id =>
        id -> MetaIO.readSpec(s.sparkContext.hadoopConfiguration,
          s"$root/_specs/s=$id")
      }.toMap
  }

  /** The transform's partition-value expression (a string column). */
  private def transformValue(transform: String, column: String) =
    transform match {
      case "month" => date_format(col(column), "yyyy-MM")
      case "day" => date_format(col(column), "yyyy-MM-dd")
      case t => throw new IllegalArgumentException(
        s"unknown partition transform: $t")
    }

  /** Closed day-string bounds a partition value covers under its
    * transform — the file side of the plan-time intersection test
    * ("-31" is a safe month upper pad under string order). */
  private def transformBounds(transform: String,
      pv: String): (String, String) =
    transform match {
      case "month" => (s"$pv-01", s"$pv-31")
      case "day" => (pv, pv)
      case t => throw new IllegalArgumentException(
        s"unknown partition transform: $t")
    }

  /** APPEND under a partition spec: one shuffle on the derived value,
    * hive-layout dirs per partition, optimistic commit (appends never
    * conflict). Returns the committed version. */
  private[graft] def appendPartitionedCommit(s: SparkSession,
      root: String, fromV: Int, batch: DataFrame, keyCol: String,
      specId: Int): Int = {
    val (transform, column) = partitionSpecs(s, root)(specId)
    val dir = s"$root/data/w=part-${attemptTag()}/ps=$specId"
    batch.withColumn("pv", transformValue(transform, column))
      .repartition(col("pv"))
      .write.partitionBy("pv").mode("overwrite").parquet(dir)
    optimisticCommit(s, root, fromV,
      listDataFiles(s, root, dir).map(("data", _)), (_, _) => true)
  }

  private val PartPathRe = ".*/ps=(\\d+)/pv=([^/]+)/.*".r

  /** Plan-time PARTITION PRUNING over a day range [lo, hi] (yyyy-MM-dd
    * strings) on `column`: drop every data file whose path-recorded
    * partition value cannot intersect the range under ITS OWN spec.
    * Files without partition metadata — or partitioned under a spec on
    * another column — are conservatively kept; one file survives as a
    * schema carrier; delete files apply as always; the exact predicate
    * refines. */
  def readVersionPartitionPruned(s: SparkSession, root: String, v: Int,
      keyCol: String, column: String, lo: String, hi: String)
      : DataFrame = {
    val specs = partitionSpecs(s, root)
    val all = manifestEntries(s, root, v)
    val kept = all.filter {
      case ("data", p, _) => p match {
        case PartPathRe(id, pv) =>
          specs.get(id.toInt) match {
            case Some((t, c)) if c == column =>
              val (plo, phi) = transformBounds(t, pv)
              plo <= hi && lo <= phi
            case _ => true
          }
        case _ => true
      }
      case _ => true
    }
    val ents =
      if (kept.exists(_._1 == "data")) kept
      else kept :+ all.find(_._1 == "data").getOrElse(
        throw new IllegalStateException(
          s"readVersionPartitionPruned: version $v has no data files"))
    readEntries(s, root, ents, keyCol)
      .filter(date_format(col(column), "yyyy-MM-dd").between(lo, hi))
  }

  // --- the partition-transform demonstration table: month-spec base
  // load, a DAY-spec evolution commit for the finer-grained tail, and a
  // merge-on-read delete on top — pruning must evaluate each file under
  // its own spec and compose with the delete mask.
  private val partDemoRootCache = graft.AppCache[String]()

  private[graft] def buildPartitionedDemo(s: SparkSession, d: String,
      root: String): Unit = {
    val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
    addPartitionSpec(s, root, 1, "month", "o_orderdate")
    val v1 = appendPartitionedCommit(s, root, 0,
      orders.filter(pmod(col("o_orderkey"), lit(10)) < 8),
      "o_orderkey", 1)
    addPartitionSpec(s, root, 2, "day", "o_orderdate")
    val v2 = appendPartitionedCommit(s, root, v1,
      orders.filter(pmod(col("o_orderkey"), lit(10)) >= 8),
      "o_orderkey", 2)
    deleteCommit(s, root, v2,
      orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .select("o_orderkey")): Unit
  }

  private[graft] def partitionedDemoTable(s: SparkSession,
      d: String): String =
    partDemoRootCache.get(s, d) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_p_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildPartitionedDemo(s, d, root)
      root
    }

  /** Date-range read via PARTITION-TRANSFORM pruning over the evolved
    * layout (month-spec base + day-spec tail + merge-on-read delete):
    * survivors are exactly the files whose recorded partition value
    * intersects the range under their own spec — must hash-match the
    * plain predicate over the base table (LakehouseSpec locks the
    * scanned-file subset per spec). */
  val qTablePartitionedRead: (SparkSession, String) => DataFrame =
    (s, d) =>
      orderedOrdersRows(readVersionPartitionPruned(
        s, partitionedDemoTable(s, d), 3, "o_orderkey", "o_orderdate",
        "1995-03-01", "1995-09-30"))

  /** Time travel from PURE SQL via the injected table-valued function
    * (GraftExtensions.graft_orders_version — the `VERSION AS OF` shape):
    * the same post-delete snapshot as q_table_snapshot_rows, reached
    * without touching the Scala API; oracle shared BY REFERENCE. */
  val qTableSqlTimeTravel: (SparkSession, String) => DataFrame = (s, d) =>
    s.sql("SELECT o_orderkey, o_custkey, " +
      "date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate, " +
      s"o_totalprice FROM graft_orders_version('$d', 3) " +
      "ORDER BY o_orderkey")

  private def versionSummary(s: SparkSession, root: String): DataFrame =
    (1 to 5).map { v =>
      readVersion(s, root, v, "o_orderkey")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_price"))
    }.reduce(_.unionAll(_)).orderBy("version")

  /** Per-version (rows, exact-decimal price sum) across all five
    * commits — the time-travel contract: every historical state remains
    * exactly reproducible after later appends, deletes, compactions,
    * and upserts. */
  val qTableTimeTravel: (SparkSession, String) => DataFrame = (s, d) =>
    versionSummary(s, versionedOrdersRoot(s, d))

  /** Full-row read of the post-delete snapshot (v3): the merge-on-read
    * path end-to-end — manifest file set + broadcast anti-join — must
    * reproduce the predicate-defined state row-for-row. */
  val qTableSnapshotRows: (SparkSession, String) => DataFrame = (s, d) =>
    orderedOrdersRows(
      readVersion(s, versionedOrdersRoot(s, d), 3, "o_orderkey"))

  /** Full-row read of the post-UPSERT snapshot (v5): sequence-scoped
    * merge-on-read end-to-end — updated keys resolve to their fresh
    * rows (the delete file masks only earlier sequences), inserted keys
    * appear, untouched keys pass through. */
  val qTableMerge: (SparkSession, String) => DataFrame = (s, d) =>
    orderedOrdersRows(
      readVersion(s, versionedOrdersRoot(s, d), 5, "o_orderkey"))

  /** Full-row read of the schema-evolved snapshot (v6): the appended
    * batch carries o_channel, every pre-evolution row surfaces it as
    * null, and no historical file was rewritten to make that true. */
  val qTableSchemaEvolution: (SparkSession, String) => DataFrame =
    (s, d) =>
      readVersion(s, versionedOrdersRoot(s, d), 6, "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("o_channel"))
        .orderBy("o_orderkey")

  /** Incremental change feed: inserts of commit 2 and deletes of commit
    * 3, read from ONLY the files those commits added (the manifest diff)
    * — never a two-snapshot scan. */
  val qTableCdc: (SparkSession, String) => DataFrame = (s, d) => {
    val root = versionedOrdersRoot(s, d)
    val (ins2, _) = changedFiles(s, root, 1, 2)
    val (_, del3) = changedFiles(s, root, 2, 3)
    val inserts = s.read.parquet(ins2: _*)
      .select(lit(2).as("version"), lit("I").as("op"), col("o_orderkey"))
    val deletes = s.read.parquet(del3: _*)
      .select(lit(3).as("version"), lit("D").as("op"), col("o_orderkey"))
    inserts.unionAll(deletes).orderBy("version", "o_orderkey")
  }

  /** Range read of the post-delete snapshot via ZONE-MAP FILE SKIPPING:
    * the key range hits a fraction of the range-clustered files and the
    * rest are dropped from table metadata before the scan is planned
    * (LakehouseSpec locks the scanned-file subset). Must hash-match the
    * plain predicate over the base table. */
  val qTablePrunedRead: (SparkSession, String) => DataFrame = (s, d) =>
    orderedOrdersRows(readVersionPruned(s, versionedOrdersRoot(s, d),
      3, "o_orderkey", 1000L, 2999L))

  /** CDC-driven incremental view maintenance WITH RETRACTIONS: a
    * per-customer rollup is built once over v1, then maintained to v3
    * purely from the change feed — v2's inserts aggregate from ONLY the
    * added files, v3's deletes retract by aggregating the deleted ROWS
    * (delete keys are equality deletes, so the retraction looks the
    * deleted rows up with a broadcast join against the pre-delete data
    * — the one pass a delete-aware view maintainer must pay, prunable
    * by zone maps/blooms at scale) — and groups whose count reaches
    * zero leave the view. The maintained view must hash-match the
    * direct aggregate over the v3 state (the oracle), proving
    * maintained ≡ recomputed without the maintenance path ever
    * scanning a snapshot. Counts and sums merge additively with signs,
    * in exact DECIMAL(18,2), so increments commute and the final
    * double cast is bit-stable.
    *
    * At 100 TB this is the standing-rollup story: each commit's delta
    * costs the CHANGE (added files; deleted rows via pruned lookup),
    * never the table — the q_rollup_increment discipline extended to
    * handle deletions. */
  val qTableMvIncrement: (SparkSession, String) => DataFrame = (s, d) => {
    val root = versionedOrdersRoot(s, d)
    def agg(df: DataFrame, sign: Int): DataFrame =
      df.groupBy("o_custkey")
        .agg((count(lit(1)) * sign).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * sign)
            .cast("decimal(18,2)").as("sum_price"))
    val mv1 = agg(readVersion(s, root, 1, "o_orderkey"), 1)
    val (ins2, _) = changedFiles(s, root, 1, 2)
    val insDelta = agg(s.read.parquet(ins2: _*), 1)
    val (_, del3) = changedFiles(s, root, 2, 3)
    // equality-delete retraction: look the deleted rows up in the
    // pre-delete state's data files (broadcast keys, pruned scan)
    val delKeys = s.read.parquet(del3: _*)
    val v2Data = manifestEntries(s, root, 2)
      .collect { case ("data", p, _) => s"$root/$p" }
    val deletedRows = s.read.parquet(v2Data: _*)
      .join(broadcast(delKeys), Seq("o_orderkey"))
    val delDelta = agg(deletedRows, -1)
    mv1.unionAll(insDelta).unionAll(delDelta)
      .groupBy("o_custkey")
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("sum_price")).cast("decimal(18,2)").as("sum_price"))
      .filter(col("n_orders") > 0)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy("o_custkey")
  }

  /** VACUUM under the read oracle: fresh commit history, reclaim
    * everything not referenced by the final compacted version, then
    * read that version — which must still hash-match the live-state
    * oracle (vacuum deleted only garbage). The reclaimed files are the
    * pre-compaction data tree and the superseded delete file;
    * LakehouseSpec counts them and pins that retained reads survive
    * while pre-horizon versions are genuinely gone. */
  /** HARD-LINK clone of an immutable table/index tree (every file is
    * an immutable parquet — mutation is always new files or whole-dir
    * renames), the per-pass isolation the staged lifecycle keys use:
    * metadata-only, ~30× cheaper than streaming the bytes. Deleting or
    * vacuuming the clone unlinks only the clone's names. */
  private[graft] def hardLinkTree(from: String, to: String,
      subs: Seq[String]): Unit = {
    import java.nio.file.{Files, Path, Paths}
    def link(src: Path, dst: Path): Unit = {
      if (Files.isDirectory(src)) {
        Files.createDirectories(dst)
        // Files.list holds a directory fd until closed — lifecycle
        // passes call this per probe, so leak-free matters
        val st = Files.list(src)
        try {
          val it = st.iterator()
          while (it.hasNext) {
            val c = it.next()
            link(c, dst.resolve(c.getFileName))
          }
        } finally st.close()
      } else Files.createLink(dst, src): Unit
    }
    subs.foreach { sub =>
      val src = Paths.get(s"$from/$sub")
      if (Files.exists(src)) link(src, Paths.get(s"$to/$sub"))
    }
  }

  // vacuum's claim is RECLAMATION + the retained read, not the history
  // build: the six-commit history stages once per (session, sf) and
  // each pass hard-links it (vacuum on the clone unlinks clone names
  // only; mtimes ride the shared inode, minutes old — graceMs=0 is
  // still the single-writer statement)
  private val stagedVacuumBase = graft.AppCache[String]()

  /** The six-commit history the RECLAMATION keys (vacuum, expire)
    * clone per pass — built once per (session, sf), separate from the
    * read keys' shared root so a maintenance bug could never corrupt
    * the read surface's fixture. */
  private def vacuumBase(s: SparkSession, d: String): String =
    stagedVacuumBase.get(s, d)({
      val r = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_vacb_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode)
      buildVersionedOrders(s, d, r)
      r
    })

  val qTableVacuum: (SparkSession, String) => DataFrame = (s, d) => {
    val base = vacuumBase(s, d)
    val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_vac_" +
      s.sparkContext.applicationId + "_" + lifecycleRuns.incrementAndGet()
    hardLinkTree(base, root,
      Seq("_snapshots", "_manifests", "data", "deletes"))
    vacuum(s, root, retainFrom = 4, graceMs = 0L)
    val out = orderedOrdersRows(readVersion(s, root, 4, "o_orderkey"))
      .localCheckpoint()
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  /** The RETENTION-POLICY arc end to end, on a hard-link clone of the
    * staged six-commit history: tag v2 as an audit pin, expire every
    * snapshot below the keep horizon (v1/v3/v4 retire; v2 survives on
    * its ref, v5/v6 on the horizon), vacuum at the same horizon (the
    * superseded v3 delete file is the only newly-unreachable data —
    * everything else is still referenced by a surviving snapshot
    * through manifest reuse), then read the head. The declared claim:
    * the whole policy pass is ROW-INVISIBLE at head — the post-expire,
    * post-vacuum v6 read hash-matches the plain evolved-state oracle.
    * LakehouseSpec pins the forensics this key cannot state in SQL:
    * expired versions refuse time travel, the pinned version stays
    * readable, reclamation is exactly the v3 delete file, and a
    * re-run expires nothing (idempotence). */
  val qTableExpire: (SparkSession, String) => DataFrame = (s, d) => {
    val base = vacuumBase(s, d)
    val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_exp_" +
      s.sparkContext.applicationId + "_" + lifecycleRuns.incrementAndGet()
    hardLinkTree(base, root,
      Seq("_snapshots", "_manifests", "data", "deletes", "_stats"))
    setRef(s, root, "audit", 2)
    expireSnapshots(s, root, keepFrom = 5)
    vacuum(s, root, retainFrom = 5, graceMs = 0L)
    val out = readVersion(s, root, 6, "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("o_channel"))
      .orderBy("o_orderkey")
      .localCheckpoint()
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  // lifecycle twin: re-run all six commits into a fresh root each call
  // so the bench times the WRITE path (manifest commits + data/delete
  // landings + compaction + merge + evolution), then emit the same
  // summary — oracle shared BY REFERENCE with q_table_time_travel.
  private val lifecycleRuns = new java.util.concurrent.atomic.AtomicLong()

  val qTableLifecycle: (SparkSession, String) => DataFrame = (s, d) => {
    val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_run_" +
      s.sparkContext.applicationId + "_" + lifecycleRuns.incrementAndGet()
    buildVersionedOrders(s, d, root)
    // materialize the 4-row summary, then drop the invocation's root
    // (the qLandingOverwrite tmpdir-accumulation discipline)
    val out = versionSummary(s, root).localCheckpoint()
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  /** The full MAINTENANCE arc as ONE driver-verified composition, into
    * a fresh root per call (the lifecycle-class bench discipline):
    * 2 streaming-style ingest epochs → 2 delete commits (the growing-D
    * regime) → rewriteDeletes (delete planning O(D²)→O(D)) →
    * mergeManifests (list rent reset) → vacuum at zero grace (the
    * single-writer maintenance window — superseded plain delete files
    * and pre-horizon manifests reclaimed) → read, which must STILL
    * hash-match the live predicate: every maintenance op is
    * row-invisible, and they compose. */
  val qTableMaintenanceLifecycle: (SparkSession, String) => DataFrame =
    (s, d) => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val root = s"${sys.props("java.io.tmpdir")}/graft_lakehouse_mnt_" +
        s.sparkContext.applicationId + "_" + lifecycleRuns.incrementAndGet()
      val orders = Tables.orders(s, d).select(OrdersCols.map(col): _*)
      // The two ingest epochs' batch writes and the two delete commits'
      // key files all derive from `orders` alone and land in disjoint
      // dirs — four independent job chains, overlapped (guide §2.6).
      // The COMMITS then publish in version order through the same
      // publishVersion protocol ingestCommit/deleteCommit run (same
      // dirs, same manifest inheritance, same entries — only the
      // staging wall-clock overlaps).
      def staged(desc: String)(f: => Unit): Future[Unit] =
        Future {
          s.sparkContext.setJobDescription(desc)
          try f finally s.sparkContext.setJobDescription(null)
        }(stagePool)
      val tag = attemptTag()
      val stages = Seq(
        staged("maintenance: ingest epoch 0") {
          orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
            .repartition(2, col("o_orderkey"))
            .write.mode("overwrite").parquet(s"$root/data/w=0")
        },
        staged("maintenance: ingest epoch 1") {
          orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
            .repartition(2, col("o_orderkey"))
            .write.mode("overwrite").parquet(s"$root/data/w=1")
        },
        staged("maintenance: delete keys v=3") {
          orders.filter(pmod(col("o_orderkey"), lit(10)) === 1)
            .select("o_orderkey").coalesce(1)
            .write.mode("overwrite").parquet(s"$root/deletes/w=3-$tag")
        },
        staged("maintenance: delete keys v=4") {
          orders.filter(pmod(col("o_orderkey"), lit(7)) === 3)
            .select("o_orderkey").coalesce(1)
            .write.mode("overwrite").parquet(s"$root/deletes/w=4-$tag")
        })
      val results = stages.map(f =>
        scala.util.Try(Await.result(f, Duration.Inf)))
      results.foreach(_.get) // surface the first staging failure
      publishVersion(s, root, 1, Seq.empty,
        listDataFiles(s, root, s"$root/data/w=0").map(("data", _, 1)))
      publishVersion(s, root, 2, snapshotManifests(s, root, 1),
        listDataFiles(s, root, s"$root/data/w=1").map(("data", _, 2)))
      publishVersion(s, root, 3, snapshotManifests(s, root, 2),
        listDataFiles(s, root, s"$root/deletes/w=3-$tag")
          .map(("delete", _, 3)))
      publishVersion(s, root, 4, snapshotManifests(s, root, 3),
        listDataFiles(s, root, s"$root/deletes/w=4-$tag")
          .map(("delete", _, 4)))
      var v = 4
      v = rewriteDeletes(s, root, v, "o_orderkey")
      v = mergeManifests(s, root, v)
      vacuum(s, root, retainFrom = v, graceMs = 0L)
      val out = orderedOrdersRows(readVersion(s, root, v, "o_orderkey"))
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      out
    }

  // the post-merge state: live keys ≡ 0 (mod 7) updated (+10), the
  // ≡ 2 (mod 3) third inserted — stated as a CASE over the base table
  private val mergedStateSql =
    "SELECT o_orderkey, o_custkey, o_orderdate, CASE WHEN o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 AND o_orderkey % 7 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice FROM orders WHERE (o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4) OR o_orderkey % 3 = 2"

  private val timeTravelOracle =
    "SELECT 1 AS version, COUNT(*) AS n_rows, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders WHERE o_orderkey % 3 = 0 " +
      "UNION ALL SELECT 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) " +
      "UNION ALL SELECT 3, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 " +
      "UNION ALL SELECT 4, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 " +
      s"UNION ALL SELECT 5, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM ($mergedStateSql) " +
      "ORDER BY version"

  // the v6 evolved head state — shared by the schema-evolution read,
  // the metadata-only manifest merge, and the retention-policy arc
  // (all three claim row-invisibility at head, so they answer to the
  // SAME SQL by reference)
  private val evolvedStateOracle =
    "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, CAST(NULL AS VARCHAR) AS o_channel FROM (" +
      mergedStateSql + ") UNION ALL " +
      "SELECT o_orderkey + 10000000, o_custkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice, 'ch' || CAST((o_orderkey + 10000000) % 3 AS VARCHAR) FROM orders WHERE o_orderkey % 97 = 5 " +
      "ORDER BY o_orderkey"

  private val liveRowsOracle =
    "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 ORDER BY o_orderkey"

  // the delete-debt demo's live state — shared by the explicit
  // rewriteDeletes key and the planner key (both claim row-invisible
  // maintenance over the same debt shape)
  private val debtLiveOracle =
    "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 10 <> 1 AND o_orderkey % 7 <> 3 AND o_orderkey % 13 <> 5 ORDER BY o_orderkey"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_table_time_travel", qTableTimeTravel, Some(timeTravelOracle)),
    QueryDef("q_table_snapshot_rows", qTableSnapshotRows,
      Some(liveRowsOracle)),
    // the same snapshot reached from pure SQL through the injected TVF
    // — oracle shared BY REFERENCE
    QueryDef("q_table_sql_time_travel", qTableSqlTimeTravel,
      Some(liveRowsOracle)),
    // same oracle BY REFERENCE: after vacuuming everything the final
    // version does not reference, the read must be unchanged
    QueryDef("q_table_vacuum", qTableVacuum, Some(liveRowsOracle)),
    // sequence-scoped merge-on-read upsert: updates resolve to fresh
    // rows, inserts appear, nothing rewritten
    QueryDef("q_table_merge", qTableMerge, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM (" +
        mergedStateSql + ") ORDER BY o_orderkey")),
    // additive schema evolution: appended batch carries a new column,
    // pre-evolution rows surface it as null, nothing rewritten
    QueryDef("q_table_schema_evolution", qTableSchemaEvolution,
      Some(evolvedStateOracle)),
    // retention policy (expire + ref pin + vacuum) is row-invisible at
    // head: the same evolved-state oracle BY REFERENCE
    QueryDef("q_table_expire", qTableExpire, Some(evolvedStateOracle)),
    QueryDef("q_table_cdc", qTableCdc, Some(
      "SELECT 2 AS version, 'I' AS op, o_orderkey FROM orders WHERE o_orderkey % 3 = 1 UNION ALL SELECT 3, 'D', o_orderkey FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 = 4 ORDER BY version, o_orderkey")),
    // field-id schema evolution: rename is metadata-only (history
    // readable under both names), add-after-drop gets a fresh id so
    // dropped data never resurrects — the read resolves physical
    // names through ids and must equal the plain CASE over orders
    QueryDef("q_table_schema_rename", qTableSchemaRename, Some(
      "SELECT o_orderkey, o_totalprice AS price, CAST(NULL AS BIGINT) AS o_custkey FROM orders WHERE o_orderkey % 3 IN (0, 1) UNION ALL SELECT o_orderkey, o_totalprice, o_custkey + 1000 FROM orders WHERE o_orderkey % 3 = 2 ORDER BY o_orderkey")),
    // merge-on-read position delete beside an equality delete: the
    // mixed-mask read must equal the plain two-predicate oracle
    QueryDef("q_table_positional_delete", qTablePositionalDelete, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 10 <> 4 AND o_custkey % 7 <> 2 ORDER BY o_orderkey")),
    // delete-file maintenance: the post-rewrite read (one cumulative
    // delete per plan group) must equal the live-state predicate
    QueryDef("q_table_rewrite_deletes", qTableRewriteDeletes,
      Some(debtLiveOracle)),
    // the metrics-driven planner choosing and running the same
    // maintenance: row-invisible end to end — same oracle BY REFERENCE
    QueryDef("q_table_auto_maintain", qTableAutoMaintain,
      Some(debtLiveOracle)),
    // CDC spanning the delete maintenance: the cumulative file reports
    // exactly the span's (distinct) deleted keys
    QueryDef("q_table_cdc_maintained", qTableCdcMaintained, Some(
      "SELECT 'D' AS op, o_orderkey FROM orders WHERE o_orderkey % 10 = 1 OR o_orderkey % 7 = 3 OR o_orderkey % 13 = 5 ORDER BY o_orderkey")),
    // bloom file skipping: the point lookup must equal the plain
    // predicate over the base table
    QueryDef("q_table_bloom_lookup", qTableBloomLookup, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_custkey = 5 ORDER BY o_orderkey")),
    // multi-column zone maps over the z-ordered layout: the 2-D range
    // read must equal the plain conjunction over the base table
    QueryDef("q_table_pruned_read_zorder", qTablePrunedReadZorder, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey BETWEEN 1000 AND 4999 AND o_custkey BETWEEN 100 AND 399 ORDER BY o_orderkey")),
    // zone-map file skipping: the pruned range read must equal the
    // plain predicate over the base table
    QueryDef("q_table_pruned_read", qTablePrunedRead, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 AND o_orderkey BETWEEN 1000 AND 2999 ORDER BY o_orderkey")),
    // partition-transform pruning over the evolved (month→day) layout
    // with a merge-on-read delete on top: must equal the plain date
    // predicate over the base table minus the deleted keys
    QueryDef("q_table_partitioned_read", qTablePartitionedRead, Some(
      "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0 AND strftime(o_orderdate, '%Y-%m-%d') BETWEEN '1995-03-01' AND '1995-09-30' ORDER BY o_orderkey")),
    // delete-aware incremental view maintenance: the maintained rollup
    // must equal the direct aggregate over the v3 state
    QueryDef("q_table_mv_increment", qTableMvIncrement, Some(
      "SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 GROUP BY o_custkey ORDER BY o_custkey")),
    // same oracle BY REFERENCE: the freshly-committed history must
    // reproduce the memoized one exactly — commits are deterministic
    QueryDef("q_table_lifecycle", qTableLifecycle, Some(timeTravelOracle)),
    // the composed maintenance arc (ingest → deletes → rewriteDeletes
    // → mergeManifests → vacuum → read): row-invisible end to end
    QueryDef("q_table_maintenance_lifecycle", qTableMaintenanceLifecycle,
      Some(
        "SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 10 <> 1 AND o_orderkey % 7 <> 3 ORDER BY o_orderkey")),
    // metadata-only manifest merge: v7 must read row-identically to v6
    // — the schema-evolution oracle shared BY REFERENCE
    QueryDef("q_table_manifest_merge", qTableManifestMerge,
      Some(evolvedStateOracle)),
    // write-audit-publish: staged snapshots surface through the ref
    // only after a clean audit; the rejected batch never moves main
    QueryDef("q_table_wap", qTableWap, Some(
      "WITH s AS (SELECT '01_base' AS step, 1 AS version, COUNT(*) AS n_rows, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders WHERE o_orderkey % 3 = 0 " +
        "UNION ALL SELECT '02_staged', 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) " +
        "UNION ALL SELECT '03_main_after_publish', 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) " +
        "UNION ALL SELECT '04_rejected_staged', 5, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM (SELECT o_totalprice FROM orders WHERE o_orderkey % 3 IN (0, 1) UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey % 97 = 5 UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey % 97 = 5) " +
        "UNION ALL SELECT '05_main_after_reject', 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1)) " +
        "SELECT * FROM s ORDER BY step")),
    // branch workflow: two commits on a named branch forked from the
    // published head, main isolated on the base throughout, then the
    // audited branch fast-forwards main in one metadata move
    QueryDef("q_table_branch", qTableBranch, Some(
      "WITH b AS (SELECT COUNT(*) AS n_rows, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders WHERE o_orderkey % 3 IN (0, 1)), " +
        "m AS (SELECT COUNT(*) AS n_rows, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM (SELECT o_totalprice FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 UNION ALL SELECT o_totalprice FROM orders WHERE o_orderkey % 3 = 2)), " +
        "s AS (SELECT '01_main_base' AS step, 2 AS version, n_rows, sum_price FROM b " +
        "UNION ALL SELECT '02_branch_deleted', 6, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 " +
        "UNION ALL SELECT '03_branch_appended', 7, n_rows, sum_price FROM m " +
        "UNION ALL SELECT '04_main_isolated', 2, n_rows, sum_price FROM b " +
        "UNION ALL SELECT '05_main_after_ff', 7, n_rows, sum_price FROM m) " +
        "SELECT * FROM s ORDER BY step")),
    // rollback is a ref move: the delete vanishes from main, the next
    // commit diverges from the rolled-back snapshot, the abandoned
    // version stays readable
    QueryDef("q_table_rollback", qTableRollback, Some(
      "WITH s AS (SELECT '01_deleted' AS step, 3 AS version, COUNT(*) AS n_rows, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4 " +
        "UNION ALL SELECT '02_rolled_back', 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) " +
        "UNION ALL SELECT '03_diverged', 4, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders " +
        "UNION ALL SELECT '04_abandoned_readable', 3, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4) " +
        "SELECT * FROM s ORDER BY step"))
  )
}
