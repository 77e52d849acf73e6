package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata alongside; decode / feature-extraction runs
  * per-partition so a real implementation amortizes codec/model setup per
  * batch (the Scala analogue of `mapInPandas` batch shape).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (dimensions derived from payload
  * length) — the Spark-side plumbing (schema, encoder, per-partition
  * batching, partitioning) is real and tested, and the fake is chosen to be
  * SQL-computable so the whole path has a DuckDB oracle.
  */
object Multimodal {

  /** Binary payload row: what an image/audio ingest table looks like. */
  final case class MediaBlob(doc_id: Long, payload: Array[Byte])

  /** Extracted features (width/height stand in for any per-item metadata a
    * real decoder would emit). */
  final case class MediaFeature(doc_id: Long, width: Int, height: Int,
      n_pixels: Long)

  /** STUB decode — a real build links an image codec here. Deterministic
    * fake: dimensions are a pure function of payload length, so results are
    * reproducible and oracle-checkable. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    (n % 640 + 1, n % 480 + 1)
  }

  /** documents.text → binary payload table (the ingest shape). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  /** Per-partition feature extraction over binary payloads. A real decoder
    * would initialize its codec once per partition here — that is the whole
    * point of the mapPartitions batch shape. */
  def extractFeatures(spark: SparkSession, blobs: DataFrame)
      : Dataset[MediaFeature] = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      // per-partition init of a (stub) codec happens here, once
      it.map { b =>
        val (w, h) = decodeStub(b.payload)
        MediaFeature(b.doc_id, w, h, w.toLong * h)
      }
    }
  }

  val qMultimodalFeatures: (SparkSession, String) => DataFrame = (s, d) =>
    extractFeatures(s, withBinaryPayload(Tables.documents(s, d)))
      .toDF()
      .orderBy("doc_id")

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG, JPEG,
    * GIF, BMP — no external codec needed): width/height/pixel-count from
    * the actual bitstream. Returns None for payloads no registered reader
    * accepts. The oracle query keeps the stub (a bitstream decode has no
    * SQL counterpart); MultimodalSpec feeds real encoded PNGs through the
    * per-partition path and asserts exact dimensions. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth, img.getHeight))

  /** Per-partition REAL decode over binary payloads — the deployable form
    * of [[extractFeatures]]. Codec configuration (ImageIO's disk cache is
    * pure overhead for in-memory byte arrays) happens once per partition,
    * which is what the mapPartitions batch shape is for; undecodable
    * payloads are dropped, not errored, matching how a 100 TB media
    * pipeline quarantines corrupt blobs rather than failing the job. */
  def extractImageFeatures(spark: SparkSession, blobs: DataFrame)
      : Dataset[MediaFeature] = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      it.flatMap { b =>
        decodeImage(b.payload).map { case (w, h) =>
          MediaFeature(b.doc_id, w, h, w.toLong * h)
        }
      }
    }
  }

  /** Resized payload row: the re-encoded thumbnail plus its dimensions. */
  final case class ResizedBlob(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int)

  /** REAL in-JDK resize: decode → scale (area-averaging, deterministic)
    * → re-encode PNG. Returns None for undecodable payloads (same
    * quarantine contract as decode). */
  def resizeImage(payload: Array[Byte], w: Int, h: Int)
      : Option[Array[Byte]] =
    Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { src =>
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src.getScaledInstance(w, h,
          java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }

  /** Per-partition batch resize to a fixed thumbnail size — the
    * normalize-before-training step of an image pipeline (every payload
    * leaves at w×h regardless of source size). Same mapPartitions batch
    * shape as decode: codec init once per partition, corrupt payloads
    * quarantined, and the output is again an opaque binary column, so
    * resize stages compose (ingest → resize → feature-extract) without
    * the data ever leaving the executor until a shuffle is actually
    * asked for. */
  def resizeImages(spark: SparkSession, blobs: DataFrame,
      w: Int = 64, h: Int = 64): Dataset[ResizedBlob] = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      it.flatMap { b =>
        resizeImage(b.payload, w, h).map(ResizedBlob(b.doc_id, _, w, h))
      }
    }
  }

  /** Frame sampling — the video/audio analogue of the decode path: one
    * media payload explodes into fixed-width frames, each carrying
    * (frame_idx, fingerprint, length). The explode is a Generate INSIDE
    * the scan stage (no shuffle — frames are born distributed next to
    * their payload), which is the property that matters when one 100 GB
    * partition of videos becomes 10k× more frame rows: the fan-out never
    * crosses the network, and downstream per-frame work (a real decoder
    * would emit pixels here; the md5 stands in as the frame payload
    * derivative) starts already-partitioned. Frames here are 64-byte
    * windows over the ASCII payload so the whole path is oracle-able. */
  val qMediaFrames: (SparkSession, String) => DataFrame = (s, d) => {
    val frame = substring(col("text"), col("fi") * 64 + 1, lit(64))
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ((length(col("text")) - 1) / lit(64)).cast("int"))).as("fi"))
      .select(col("doc_id"), col("fi").cast("long").as("frame_idx"),
        md5(to_binary(frame, lit("utf-8"))).as("frame_md5"),
        length(frame).as("frame_len"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Blob-store ingest via Spark's `binaryFile` source — how a media
    * corpus actually arrives: one file per asset, read distributed as
    * (path, modificationTime, length, content) with pathGlobFilter /
    * recursiveFileLookup pruning at listing time. The fixture lands one
    * `.bin` file per document from EXECUTOR-side partition writers (a
    * driver loop over assets would be the anti-pattern; each task writes
    * only its partition), plus a decoy `.txt` per shard that the glob
    * filter must skip. The declared result keys each blob by the id
    * parsed from its path and fingerprints the bytes — the oracle
    * recomputes both from the source table, so the driver hash-proves
    * the file roundtrip byte-identically. At 100 TB the same plan reads
    * an object store; `binaryFile` caps file size by conf, which is the
    * documented reason frame EXTRACTION (q_media_frames) and decode run
    * on the opaque column, not re-reads. */
  /** One-file-per-asset blob fixture: land `<stem>_<doc_id>.bin` per
    * document from EXECUTOR-side partition writers (a driver loop over
    * assets would be the anti-pattern; each task writes only its
    * partition), plus a decoy `.txt` per shard that the binaryFile
    * glob filter must skip. Staged once per (app, fixture), atomic
    * staging-dir publish. `payload` is the byte column to land. */
  private def blobFixture(s: SparkSession, tmp: String, stem: String,
      payloads: DataFrame): String = {
    val dirFile = new java.io.File(tmp)
    if (!dirFile.exists()) {
      val staging = tmp + "_staging"
      new java.io.File(staging).mkdirs()
      payloads
        .repartition(8)
        .foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            var decoy = -1L
            rows.foreach { r =>
              val id = r.getLong(0)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(staging, s"${stem}_$id.bin"),
                r.getAs[Array[Byte]](1)): Unit
              decoy = id
            }
            if (decoy >= 0)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(staging, s"skip_$decoy.txt"),
                "not a blob".getBytes): Unit
        }
      // atomic publish: readers never see a half-written staging dir
      if (!new java.io.File(staging).renameTo(dirFile))
        require(dirFile.exists(), s"binary fixture publish failed: $tmp")
    }
    tmp
  }

  val qScanBinary: (SparkSession, String) => DataFrame = (s, d) => {
    val tmp = blobFixture(s,
      s"${sys.props("java.io.tmpdir")}/graft_scan_binary_" +
        s.sparkContext.applicationId,
      "doc",
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload")))
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(tmp)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  // --- q_multimodal_dedup: the JOINT pipeline over blobs × text ×
  // embeddings — one fused dedup decision instead of three parallel
  // ones. The arc: (1) byte-dedup over the BLOB STORE — each document's
  // thumbnail rendition lands as a binary asset, is read back via
  // binaryFile, fingerprinted, and byte-identical renditions pair up
  // through a fingerprint equi-join (hash-shuffle on the digest — at
  // 100 TB this is the dedup join, never an all-pairs shape);
  // (2) CROSS-MODAL pairing — the asset binds to its document by the
  // path-parsed key, the document to its embedding by id, so all three
  // modalities speak the same doc_id; (3) the FUSED decision — a pair
  // from ANY modality (byte-identical rendition OR n-gram-Jaccard text
  // near-dup OR embedding ε-pair) is an edge, and connected components
  // over the union assigns one cluster per transitive group (exact-byte
  // ∪ near-text ∪ near-embedding ⇒ one canonical). The text pairs
  // reuse the prefix-filtered Jaccard path, the embedding pairs the
  // bucketed exact ε-join, the components the driver/distributed CC —
  // every leg is the family's deployed 100 TB shape, composed.
  //
  // The thumbnail decode is a STUB like decodeStub (this container has
  // no image codec): the rendition bytes are the utf-8 of the
  // normalized 32-char text prefix — deterministic and SQL-computable,
  // so the DuckDB oracle replays the ENTIRE arc including the store
  // fingerprints and the recursive closure; a real build swaps the
  // rendition for a perceptual thumbnail and nothing else changes.
  // MultimodalSpec pins what the oracle can't see: the fused partition
  // ≡ an independent union-find over the union of the three pair sets,
  // every per-modality pair co-clustered, and the store roundtrip
  // byte-exact.

  /** The stub thumbnail rendition of a document (see above). */
  private def thumbPayload =
    encode(substring(
      lower(regexp_replace(col("text"), "\\s+", " ")), 1, 32), "utf-8")

  private def thumbStore(s: SparkSession, d: String): String =
    blobFixture(s,
      s"${sys.props("java.io.tmpdir")}/graft_thumb_store_" +
        s.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(d.hashCode),
      "thumb",
      Tables.documents(s, d).select(col("doc_id"),
        thumbPayload.as("payload")))

  val qMultimodalDedup: (SparkSession, String) => DataFrame = (s, d) => {
    val blobs = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(thumbStore(s, d))
      .select(
        regexp_extract(col("path"), "thumb_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        md5(col("content")).as("thumb_md5"))
      .localCheckpoint()
    val bytePairs = blobs
      .select(col("doc_id").as("doc_a"), col("thumb_md5").as("fp"))
      .join(blobs.select(col("doc_id").as("doc_b"),
        col("thumb_md5").as("fp")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val textPairs = Dedup.cachedNgramPairs(s, d).select("doc_a", "doc_b")
    val embPairs = Similarity.cachedEmbedPairs(s, d)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val pairs = bytePairs.unionByName(textPairs).unionByName(embPairs)
      .distinct()
    val canon = Dedup.connectedComponents(pairs)
    Tables.documents(s, d).select("doc_id")
      .join(blobs, Seq("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .select(col("doc_id"), col("thumb_md5"),
        coalesce(col("canonical"), col("doc_id")).as("canonical"))
      .orderBy("doc_id")
  }

  // the fused-dedup oracle replays the whole arc in SQL: the stub
  // rendition fingerprints, all three pair sets (byte-identical
  // renditions, the shared n-gram-Jaccard CTE, the embedding ε-pairs),
  // and the transitive closure over their union
  private val multimodalDedupOracle =
    "WITH RECURSIVE th AS (SELECT doc_id, md5(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), 1, 32)) AS thumb_md5 FROM documents), " +
      "bp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM th a JOIN th b ON a.thumb_md5 = b.thumb_md5 AND a.doc_id < b.doc_id), " +
      Dedup.ngramPairsCte + ", " +
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), " +
      "ep AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM e a JOIN e b ON a.vec_id < b.vec_id AND list_dot_product(a.ce, b.ce) / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) >= 0.4), " +
      "allp AS (SELECT doc_a, doc_b FROM bp UNION SELECT doc_a, doc_b FROM pairs UNION SELECT doc_a, doc_b FROM ep), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM allp UNION ALL SELECT doc_b, doc_a FROM allp), " +
      "reach(src, dst) AS (SELECT src, dst FROM edges UNION SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src), " +
      "canon AS (SELECT src AS doc_id, least(src, MIN(dst)) AS canonical FROM reach GROUP BY src) " +
      "SELECT d.doc_id, t.thumb_md5, COALESCE(c.canonical, d.doc_id) AS canonical FROM documents d JOIN th t USING (doc_id) LEFT JOIN canon c ON d.doc_id = c.doc_id ORDER BY d.doc_id"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_scan_binary", qScanBinary, Some(
      "SELECT doc_id, octet_length(encode(text)) AS length, md5(text) AS content_md5 FROM documents ORDER BY doc_id")),
    QueryDef("q_multimodal_dedup", qMultimodalDedup,
      Some(multimodalDedupOracle)),
    QueryDef("q_multimodal_features", qMultimodalFeatures, Some(
      "SELECT doc_id, octet_length(encode(text)) % 640 + 1 AS width, octet_length(encode(text)) % 480 + 1 AS height, CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) * (octet_length(encode(text)) % 480 + 1) AS n_pixels FROM documents ORDER BY doc_id")),
    QueryDef("q_media_frames", qMediaFrames, Some(
      "SELECT doc_id, fi AS frame_idx, md5(substring(text, CAST(fi * 64 + 1 AS INT), 64)) AS frame_md5, CAST(len(substring(text, CAST(fi * 64 + 1 AS INT), 64)) AS INT) AS frame_len FROM (SELECT doc_id, text, unnest(range(0, ((len(text) - 1) // 64) + 1)) AS fi FROM documents WHERE len(text) > 0) ORDER BY doc_id, frame_idx"))
  )
}
