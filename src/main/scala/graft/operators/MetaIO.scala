package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-side parquet I/O for the lakehouse layer's TINY metadata
  * tables — manifests, snapshot lists, refs, schema logs, partition
  * specs, and the zone-map sidecar READS. Each of these holds a handful
  * of rows, yet as `spark.read`/`DataFrame.write` calls every access was
  * a full Spark job (task scheduling + the Hadoop commit protocol's
  * temp-dir/rename dance): a single six-commit lifecycle run executed
  * ~40 such jobs, and at 32 cores the session sat >95% idle through all
  * of them. Metadata belongs on the driver (the Iceberg/Delta
  * discipline: manifests and commit logs are driver-side file I/O, only
  * DATA moves through the cluster), so these helpers read and write the
  * same parquet files directly with parquet-hadoop — the on-disk format,
  * file naming (`part-*.parquet` inside the dir) and therefore every
  * other consumer (Spark reads in specs/tools, hard-link clones, vacuum)
  * are unchanged.
  *
  * Scale note: all of these tables are O(#manifests | #schema versions |
  * #refs) rows — bounded by commit/maintenance cadence, never by data —
  * which is exactly why driver-side I/O is the right cost model at any
  * scale (guide §5: the driver should do no DATA work; a distributed job
  * per metadata row set is the inverse mistake).
  */
private[graft] object MetaIO {

  private val ManifestType = MessageTypeParser.parseMessageType(
    "message manifest { optional binary kind (UTF8); " +
      "optional binary path (UTF8); optional int32 seq; }")
  private val SnapshotType = MessageTypeParser.parseMessageType(
    "message snapshot { optional binary mpath (UTF8); }")
  private val VersionType = MessageTypeParser.parseMessageType(
    "message ref { optional int32 version; }")
  private val SchemaLogType = MessageTypeParser.parseMessageType(
    "message schemalog { optional int32 fid; " +
      "optional binary name (UTF8); optional binary dtype (UTF8); }")
  private val SpecType = MessageTypeParser.parseMessageType(
    "message spec { optional binary transform (UTF8); " +
      "optional binary column (UTF8); }")

  /** Write `rows` as ONE parquet file inside `dir` (Spark part-file
    * naming so every existing listing/cloning rule applies unchanged).
    * Callers that need overwrite semantics delete the dir first —
    * commit-path writers never do (attempt dirs are UUID-unique; the
    * publish rename stays the only atomic decision point). */
  private def writeFile(conf: Configuration, dir: String,
      schema: MessageType)(rows: SimpleGroupFactory => Seq[Group]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val file = new Path(d,
      s"part-00000-${java.util.UUID.randomUUID.toString.take(8)}.parquet")
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows(new SimpleGroupFactory(schema)).foreach(w.write)
    finally w.close()
  }

  /** Every visible parquet part file under `dir` (non-recursive — these
    * metadata dirs are flat), in name order. */
  private def partFiles(conf: Configuration, dir: String): Seq[Path] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.listStatus(d)
      .filter(st => st.isFile && st.getLen > 0 && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath).sortBy(_.getName).toSeq
  }

  private def readGroups(conf: Configuration, dirs: Seq[String])
      : Seq[Group] =
    dirs.flatMap(dir => partFiles(conf, dir)).flatMap { f =>
      val r = ParquetReader
        .builder(new GroupReadSupport(), f).withConf(conf).build()
      try Iterator.continually(r.read()).takeWhile(_ != null).toList
      finally r.close()
    }

  private def has(g: Group, field: String): Boolean =
    g.getType.containsField(field) && g.getFieldRepetitionCount(field) > 0

  private def str(g: Group, field: String): String =
    if (has(g, field)) g.getBinary(field, 0).toStringUsingUTF8 else null

  private def int(g: Group, field: String): Int = g.getInteger(field, 0)

  private def lng(g: Group, field: String): Long = g.getLong(field, 0)

  // --- manifests: (kind, path, seq) ---

  def writeManifest(conf: Configuration, dir: String,
      rows: Seq[(String, String, Int)]): Unit =
    writeFile(conf, dir, ManifestType)(f => rows.map { case (k, p, q) =>
      f.newGroup().append("kind", k).append("path", p).append("seq", q)
    })

  def readManifests(conf: Configuration, dirs: Seq[String])
      : Seq[(String, String, Int)] =
    readGroups(conf, dirs)
      .map(g => (str(g, "kind"), str(g, "path"), int(g, "seq")))

  // --- snapshot lists: (mpath) ---

  def writeSnapshot(conf: Configuration, dir: String,
      mpaths: Seq[String]): Unit =
    writeFile(conf, dir, SnapshotType)(f =>
      mpaths.map(m => f.newGroup().append("mpath", m)))

  def readSnapshot(conf: Configuration, dir: String): Seq[String] =
    readGroups(conf, Seq(dir)).map(str(_, "mpath"))

  // --- ref log entries: (version) ---

  def writeVersionRow(conf: Configuration, dir: String,
      version: Int): Unit =
    writeFile(conf, dir, VersionType)(f =>
      Seq(f.newGroup().append("version", version)))

  def readVersionRow(conf: Configuration, dir: String): Int =
    int(readGroups(conf, Seq(dir)).head, "version")

  // --- schema log: (fid, name, dtype) ---

  def writeSchemaLog(conf: Configuration, dir: String,
      fields: Seq[(Int, String, String)]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true): Unit // overwrite semantics
    writeFile(conf, dir, SchemaLogType)(f => fields.map {
      case (fid, n, t) =>
        f.newGroup().append("fid", fid).append("name", n).append("dtype", t)
    })
  }

  def readSchemaLog(conf: Configuration, dirs: Seq[String])
      : Seq[(Int, String, String)] =
    readGroups(conf, dirs)
      .map(g => (int(g, "fid"), str(g, "name"), str(g, "dtype")))

  // --- partition specs: (transform, column) ---

  def writeSpec(conf: Configuration, dir: String, transform: String,
      column: String): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true): Unit
    writeFile(conf, dir, SpecType)(f =>
      Seq(f.newGroup().append("transform", transform)
        .append("column", column)))
  }

  def readSpec(conf: Configuration, dir: String): (String, String) = {
    val g = readGroups(conf, Seq(dir)).head
    (str(g, "transform"), str(g, "column"))
  }

  // --- zone-map sidecar reads (files are written by distributed jobs —
  // the stats AGGREGATION is data work — but read driver-side at plan
  // time): _stats (path, kmin, kmax) and _stats2 (path, cname, vmin,
  // vmax) ---

  def readKeyStats(conf: Configuration, dirs: Seq[String])
      : Map[String, (Long, Long)] =
    readGroups(conf, dirs)
      .filter(g => has(g, "kmin") && has(g, "kmax"))
      .map(g => str(g, "path") -> ((lng(g, "kmin"), lng(g, "kmax"))))
      .toMap

  def readColStats(conf: Configuration, dirs: Seq[String])
      : Seq[(String, String, Long, Long)] =
    readGroups(conf, dirs)
      .filter(g => has(g, "vmin") && has(g, "vmax"))
      .map(g => (str(g, "path"), str(g, "cname"),
        lng(g, "vmin"), lng(g, "vmax")))
}
