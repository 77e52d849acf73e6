package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.operators.Lakehouse

/** The versioned table as a STREAMING SOURCE — the Delta/Iceberg
  * streaming-source pattern: each micro-batch consumes the next
  * committed version(s)' CDC slice derived from the MANIFEST DIFF
  * (inserts from the commit's added data files, retractions from its
  * delete entries resolved against the prior live view), and the
  * cursor is simply the table VERSION, checkpointed by the engine as
  * the stream offset — restart resumes exactly after the last
  * committed version, replays are the same manifest diff, and a
  * maintenance-only commit (compaction, delete rewrite, schema
  * evolution) yields an EMPTY batch because its entries are
  * seq-stamped at or below the version they restate (the
  * [[Lakehouse.changedFiles]] seq-invariant).
  *
  * Output schema = the table's columns plus `_change_type`
  * ('insert'/'delete') and `_commit_version` — the Delta CDF shape.
  *
  * Implemented against the V1 `Source` API deliberately: `getBatch`
  * returns a DATAFRAME, so each slice is a declarative Catalyst plan
  * (manifest-scoped parquet scans, broadcast key joins) with pushdown
  * and pruning intact — a DSv2 `PartitionReader` would force
  * hand-rolled row reading. At 100 TB each trigger plans from
  * metadata only: the insert scan reads exactly the commit's added
  * files, the retraction join broadcasts the commit's delete keys
  * against the prior version's live view (zone-map/bloom-prunable),
  * and nothing ever rescans the table.
  *
  * Registered as `graft-table-changes` (META-INF/services); options:
  * `path` (table root), `keyCol` (delete-key column),
  * `startingVersion` (first version to emit, default 1 — the full
  * history replay), `initialSnapshot` (default false — when true, the
  * FIRST consumed version emits the full LIVE VIEW of that snapshot
  * as inserts instead of its manifest diff: the fresh-consumer
  * bootstrap. A manifest diff needs version v−1's snapshot, so plain
  * CDC can only start INSIDE the retention horizon — after
  * [[Lakehouse.expireSnapshots]] retired the early history, a new
  * consumer starts `startingVersion = <post-horizon version>,
  * initialSnapshot = true` and gets snapshot-then-CDC, the
  * Delta/Iceberg bootstrap semantics. A RESUMING consumer whose
  * checkpointed cursor fell below the horizon fails crisply instead
  * — the cursor-within-retention contract, spec-pinned).
  */
class TableChangesProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table-changes"

  override def sourceSchema(ctx: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), TableChangeSource.changeSchema(
      ctx.sparkSession, parameters, schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TableChangeSource(ctx.sparkSession,
      parameters.getOrElse("path",
        sys.error("graft-table-changes: 'path' option is required")),
      parameters.getOrElse("keyCol",
        sys.error("graft-table-changes: 'keyCol' option is required")),
      parameters.get("startingVersion").map(_.toInt).getOrElse(1),
      TableChangeSource.tableSchema(ctx.sparkSession, parameters, schema),
      parameters.get("initialSnapshot").exists(_.toBoolean))
}

object TableChangeSource {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** The TABLE schema: caller-supplied, or read from one data file of
    * the latest snapshot (one footer — files under additive evolution
    * null-fill through the explicit-schema read below). */
  private[graft] def tableSchema(s: SparkSession,
      parameters: Map[String, String],
      userSchema: Option[StructType]): StructType =
    userSchema.getOrElse {
      val root = parameters("path")
      val v = Lakehouse.latestVersion(s, root)
      val f = Lakehouse.manifestEntries(s, root, v)
        .collectFirst { case ("data", p, _) => s"$root/$p" }
        .getOrElse(sys.error(
          s"graft-table-changes: no data files at $root v=$v"))
      s.read.parquet(f).schema
    }

  private[graft] def changeSchema(s: SparkSession,
      parameters: Map[String, String],
      userSchema: Option[StructType]): StructType =
    StructType(tableSchema(s, parameters, userSchema).fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, IntegerType, nullable = false)))
}

class TableChangeSource(spark: SparkSession, root: String,
    keyCol: String, startingVersion: Int, table: StructType,
    initialSnapshot: Boolean = false)
    extends Source {
  import TableChangeSource._

  override val schema: StructType = StructType(table.fields ++ Seq(
    StructField(ChangeTypeCol, StringType, nullable = false),
    StructField(CommitVersionCol, IntegerType, nullable = false)))

  private def ver(o: OffsetV1): Int = o match {
    case LongOffset(l) => l.toInt
    case other => other.json.trim.toInt // SerializedOffset from the log
  }

  /** Latest committed version, or None before the first commit. One
    * directory listing — the engine polls this per trigger. */
  override def getOffset: Option[OffsetV1] =
    try Some(LongOffset(Lakehouse.latestVersion(spark, root).toLong))
    catch { case _: java.io.FileNotFoundException => None }

  /** The CDC slice of ONE commit: inserts from its added data files,
    * retractions from its delete keys resolved against the PRIOR live
    * view (so keys already dead at v-1 don't re-retract — the merge
    * commit's own fresh rows are seq-scoped out by readVersion), and
    * positionally-deleted rows resolved through their (file, ordinal)
    * masks. A maintenance commit contributes nothing: its entries are
    * stamped at or below the prior version. */
  private def slice(v: Int): Seq[DataFrame] = {
    val tcols = table.fields.map(f => col(f.name)).toSeq
    def tagged(df: DataFrame, kind: String): DataFrame =
      df.select(tcols: _*)
        .withColumn(ChangeTypeCol, lit(kind))
        .withColumn(CommitVersionCol, lit(v))
    if (v == startingVersion && initialSnapshot) {
      // bootstrap: the snapshot's LIVE VIEW as inserts — needs only
      // version v itself, so it works at the retention horizon where
      // the v−1 diff below is unreadable
      Seq(tagged(Lakehouse.readVersion(spark, root, v, keyCol), "insert"))
    } else if (v == 1) {
      val ins = Lakehouse.manifestEntries(spark, root, 1)
        .collect { case ("data", p, _) => s"$root/$p" }
      if (ins.isEmpty) Seq.empty
      else Seq(tagged(spark.read.schema(table).parquet(ins: _*), "insert"))
    } else {
      val (ins, del) = Lakehouse.changedFiles(spark, root, v - 1, v)
      val inserts =
        if (ins.isEmpty) Seq.empty
        else Seq(tagged(spark.read.schema(table).parquet(ins: _*),
          "insert"))
      val retracts =
        if (del.isEmpty) Seq.empty
        else Seq(tagged(Lakehouse.readVersion(spark, root, v - 1, keyCol)
          .join(broadcast(spark.read.parquet(del: _*)
            .select(keyCol).distinct()), Seq(keyCol)), "delete"))
      val before = Lakehouse.snapshotManifests(spark, root, v - 1).toSet
      val hasPdel = Lakehouse.readManifests(spark, root,
          Lakehouse.snapshotManifests(spark, root, v).filterNot(before))
        .exists(e => e._1 == "pdelete" && e._3 > v - 1)
      val pretracts =
        if (!hasPdel) Seq.empty
        else Seq(tagged(
          Lakehouse.positionalDeletedRows(spark, root, v - 1, v),
          "delete"))
      inserts ++ retracts ++ pretracts
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1)
      : DataFrame = {
    val from = math.max(start.map(ver).getOrElse(startingVersion - 1),
      startingVersion - 1)
    val to = ver(end)
    val slices = (from + 1 to to).flatMap(slice)
    val batch = slices.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema))
    GraftBridge.streamingDataFrame(spark, batch)
  }

  override def stop(): Unit = ()
}
