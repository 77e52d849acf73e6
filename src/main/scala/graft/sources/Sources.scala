package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table sources/sinks beyond parquet (SURVEY.md §2.1): the reference's
  * whole-file JSON store (S1 scan `dags/subscription_flow.py:27-29`, S2
  * rewrite `:32-34`) plus CSV. Always schema-explicit — at 100 TB schema
  * inference is a full extra pass over the data.
  */
object Sources {

  /** S1 — JSON array-file scan (the reference's store format is one JSON
    * array per table, hence multiLine). */
  def readJsonTable(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("multiLine", value = true).json(path)

  /** Line-delimited JSON scan — the scalable variant (splittable, unlike
    * multiLine arrays; this is what a 100 TB JSON corpus must use). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).json(path)

  /** S2 — whole-store rewrite, as line-delimited JSON. The reference
    * rewrites its file in place; the Spark shape is an overwrite of an
    * immutable derived table. coalesce(1) mirrors the single-file store at
    * fixture scale — a real deployment drops it and writes partitioned. */
  def writeJsonTable(df: DataFrame, path: String,
      singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).json(path)

  /** Corrupt-tolerant line-delimited JSON scan — the PERMISSIVE ingest
    * contract a 100 TB raw feed needs: malformed lines must neither kill
    * the job (FAILFAST) nor vanish silently (DROPMALFORMED). Each
    * malformed line parses to a row with all data fields null and the
    * RAW LINE preserved in `_corrupt_record`, so the caller can split
    * the scan into a clean stream and a quarantine table in one pass —
    * same file reads, no second scan. Deliberately NOT the json-source
    * PERMISSIVE mode: Spark disallows any query that references only
    * the source's corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    * the documented workaround is caching the scan, a non-starter at
    * corpus scale). Reading as TEXT and parsing with the codegen'd
    * `from_json` expression sidesteps the restriction with identical
    * semantics: the quarantine projection is then an ordinary column,
    * free to stand alone. */
  def readJsonLinesPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    val full = schema.add("_corrupt_record", "string")
    spark.read.text(path)
      .select(from_json(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
      .select(col("r.*"))
  }

  /** The clean stream of a permissive scan: rows that parsed. */
  def validRows(scanned: DataFrame): DataFrame =
    scanned.filter(scanned("_corrupt_record").isNull)
      .drop("_corrupt_record")

  /** The quarantine table of a permissive scan: the raw text of every
    * line that failed to parse, for replay/debug — the dead-letter
    * pattern. */
  def quarantineRows(scanned: DataFrame): DataFrame =
    scanned.filter(scanned("_corrupt_record").isNotNull)
      .select(scanned("_corrupt_record").as("raw"))

  /** Schema-INFERRED JSON reads — the reference's implicit-schema load
    * (`_load_json`, dags/subscription_flow.py:27-29) for exploratory use.
    * Inference is an extra full pass over the data (Spark samples per
    * `samplingRatio`), so production paths keep the schema-explicit
    * variants above; this is the notebook convenience. */
  def readJsonTableInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true).json(path)

  /** Line-delimited, schema-inferred (exploratory). */
  def readJsonLinesInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def readCsvTable(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("header", value = true).csv(path)

  def writeCsvTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", value = true)
      .csv(path)

  /** Hive-style partitioned parquet sink (`path/col=value/...`): the
    * 100 TB output layout — downstream scans of one partition value read
    * only that directory (partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String)
      : Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
      .parquet(path)

  /** ORC scan/sink — the other columnar interchange format Spark ships
    * natively (vectorized reader, predicate pushdown, same scan
    * properties as parquet). Schema-explicit like every other source. */
  def readOrcTable(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrcTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Parquet layout for POINT LOOKUPS on a high-cardinality key the
    * table is NOT sorted by — the 100 TB needle-in-haystack shape
    * (fetch one document/event by id out of an ingest-ordered corpus).
    * Min/max zone maps are useless there: a hash-scattered key spans
    * ~the full domain in every row group, so a point predicate prunes
    * nothing. Parquet BLOOM FILTERS are the layout answer: a per-row-
    * group bloom on the key lets the reader skip every row group that
    * definitely lacks it — IO drops from corpus-sized to ~one row group
    * — at a few bits per value of file overhead.
    *
    * Dictionary encoding is disabled FOR THE KEY COLUMN: at fixture
    * scale every row group's ids would fit a dictionary page and
    * parquet's dictionary filter would prune by exact-match instead,
    * masking what happens at corpus scale where high-cardinality
    * columns overflow dictionaries and fall back to plain encoding —
    * precisely the regime blooms exist for. (BloomScanSpec stages the
    * same layout WITHOUT the bloom as its control.)
    *
    * One file per shuffle partition, each file one row group at this
    * volume; `spark.read.parquet(path).filter(col === k)` needs no
    * special code — the pushed Eq predicate reaches parquet-mr's
    * bloom-based row-group filter (on by default). */
  def writeBloomIndexed(df: DataFrame, path: String, keyCol: String,
      nFiles: Int, withBloom: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.repartition(nFiles, col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option(s"parquet.enable.dictionary#$keyCol", "false")
    (if (withBloom)
      w.option(s"parquet.bloom.filter.enabled#$keyCol", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$keyCol", "100000")
    else w).parquet(path)
  }

  /** XML scan/sink — Spark 4's built-in XML data source (the Databricks
    * spark-xml donation), for the B2B/legacy feeds that still arrive as
    * XML. rowTag-delimited records ARE splittable on read; the format's
    * scale caveat is write-side verbosity, so it is an ingest format
    * here, never a landing layout. Schema-explicit like every source. */
  def readXmlTable(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("rowTag", "row").xml(path)

  /** Write-audit-publish: the safe-landing discipline for production
    * batch jobs. The frame lands in a STAGING directory, the audit
    * function runs against a reader over that staging (referential
    * integrity, row counts, null gates — whatever the caller composes),
    * and only on audit success does the staging directory move atomically
    * into the published path (HDFS/posix rename — one metadata op, never
    * a data copy; object stores swap this for a manifest commit). A
    * failed audit leaves the published path UNTOUCHED and the staging
    * directory in place for forensics — downstream readers can never
    * observe a half-landed or audit-failing table.
    *
    * Returns true when published. At 100 TB the audit cost is a query
    * over the staged data (usually aggregates — integrity counts), and
    * the publish is O(1) regardless of data size.
    */
  def writeAuditPublish(df: DataFrame, publishPath: String,
      audit: DataFrame => Boolean,
      partitionCols: Seq[String] = Nil,
      stagingPath: Option[String] = None,
      prevPath: Option[String] = None): Boolean = {
    val spark = df.sparkSession
    // When the publish target is a partition DIRECTORY inside a
    // discovered layout (hour_layout/day=X), the default suffix names
    // would themselves parse as partition values — "day=X.staging"
    // IS a day to Spark's discovery, so a concurrent reader over the
    // parent would see staged/retired copies as extra days. Such
    // callers override both with dot-prefixed siblings (discovery
    // skips names starting with '.' or '_'), keeping every
    // intermediate state invisible to readers of the layout.
    val staging = stagingPath.getOrElse(publishPath + ".staging")
    val w0 = df.write.mode("overwrite")
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*)
      else w0
    w.parquet(staging)
    val staged = spark.read.parquet(staging)
    if (!audit(staged)) false
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val pub = new org.apache.hadoop.fs.Path(publishPath)
      val stg = new org.apache.hadoop.fs.Path(staging)
      val prev = new org.apache.hadoop.fs.Path(
        prevPath.getOrElse(publishPath + ".prev"))
      val fs = pub.getFileSystem(conf)
      // Retire-then-swap, never delete-then-swap: the previous version
      // moves ASIDE (one rename), the staged version moves IN (one
      // rename), and only then does the retired copy leave. A crash
      // between the two renames loses nothing — the old table is intact
      // at .prev and recoverable; a failed swap rolls the old version
      // back so readers are never left without a published path. Every
      // rename's boolean is asserted, not discarded.
      //
      // Crash recovery first: if a PRIOR run died between its renames,
      // `.prev` holds the ONLY copy (publish path absent) — deleting it
      // here would destroy the last recoverable version before the new
      // staging is swapped in. Roll it back into place, then cycle.
      if (!fs.exists(pub) && fs.exists(prev) && !fs.rename(prev, pub))
        throw new java.io.IOException(
          s"writeAuditPublish: failed to roll back $prev to $pub")
      if (fs.exists(prev)) fs.delete(prev, true)
      val hadOld = fs.exists(pub)
      if (hadOld && !fs.rename(pub, prev))
        throw new java.io.IOException(
          s"writeAuditPublish: failed to retire $pub to $prev")
      if (!fs.rename(stg, pub)) {
        if (hadOld && !fs.rename(prev, pub))
          throw new java.io.IOException(
            s"writeAuditPublish: swap failed AND rollback of $prev failed")
        throw new java.io.IOException(
          s"writeAuditPublish: failed to publish $stg to $pub" +
            (if (hadOld) " (previous version restored)" else ""))
      }
      if (hadOld) fs.delete(prev, true)
      true
    }
  }

  def writeXmlTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", "row").xml(path)
}
