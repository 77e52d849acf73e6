package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal

/** Real image decode through the per-partition multimodal path: generated
  * PNG/JPEG payloads (in-JDK encoders — no external codecs) must come back
  * with their exact pixel dimensions, and corrupt payloads must be
  * quarantined (dropped), not crash the partition. */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // deterministic non-constant content so encoders can't degenerate
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("binaryFile scan: glob filter skips decoys, lengths match bytes") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val r = Multimodal.qScanBinary(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    // one row per document, none for the .txt decoys the writer plants
    assert(r.count() === docs.count())
    assert(r.filter(col("doc_id").isNull).count() === 0L)
    // the source's length metadata must equal the actual payload bytes
    val j = r.join(docs, "doc_id")
      .filter(col("length") =!= octet_length(encode(col("text"), "utf-8")))
    assert(j.isEmpty)
  }

  test("per-partition decode recovers exact dimensions from real PNGs") {
    import spark.implicits._
    val dims = Seq((1L, 7, 11), (2L, 64, 48), (3L, 640, 2), (4L, 1, 1))
    val blobs = dims.map { case (id, w, h) => (id, png(w, h)) }
      .toDF("doc_id", "payload")
      .repartition(3) // decode must work across partition boundaries
    val got = Multimodal.extractImageFeatures(spark, blobs)
      .collect().map(f => (f.doc_id, f.width, f.height, f.n_pixels))
      .sortBy(_._1)
    assert(got.toSeq === dims.map { case (id, w, h) =>
      (id, w, h, w.toLong * h)
    })
  }

  test("undecodable payloads are dropped, decodable neighbors survive") {
    import spark.implicits._
    val blobs = Seq(
      (1L, png(10, 10)),
      (2L, Array[Byte](1, 2, 3, 4)), // not an image
      (3L, "just some text bytes".getBytes("UTF-8")),
      (4L, png(20, 5)))
      .toDF("doc_id", "payload")
    val got = Multimodal.extractImageFeatures(spark, blobs)
      .collect().map(f => (f.doc_id, f.width, f.height)).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 10, 10), (4L, 20, 5)))
  }

  test("jpeg decodes through the same path (format autodetection)") {
    import spark.implicits._
    val img = new BufferedImage(33, 21, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val blobs = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val got = Multimodal.extractImageFeatures(spark, blobs).collect()
    assert(got.map(f => (f.doc_id, f.width, f.height)).toSeq ===
      Seq((9L, 33, 21)))
  }

  test("resize normalizes every decodable payload to the target size " +
      "and composes with the decode stage") {
    import spark.implicits._
    val blobs = Seq(
      (1L, png(7, 11)), (2L, png(640, 2)), (3L, png(64, 64)),
      (4L, Array[Byte](0, 1, 2))) // corrupt → quarantined
      .toDF("doc_id", "payload")
      .repartition(2)
    val resized = Multimodal.resizeImages(spark, blobs, 64, 64)
    // resize output is itself a valid media-blob table: feed it straight
    // back through the decode stage and demand exact thumbnail dims
    val redecoded = Multimodal
      .extractImageFeatures(spark, resized.toDF())
      .collect().map(f => (f.doc_id, f.width, f.height)).sortBy(_._1)
    assert(redecoded.toSeq === Seq((1L, 64, 64), (2L, 64, 64),
      (3L, 64, 64)))
  }

  test("fused multimodal dedup: store fingerprints are byte-exact and " +
    "the partition is exactly union-find over the union of the byte, " +
    "text, and embedding pair sets") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_multimodal_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fused = out.map(t => t._1 -> t._3).toMap
    // the store-read fingerprint must equal the direct md5 of the stub
    // rendition — the blob write→binaryFile→digest roundtrip is
    // byte-exact (and the decoy .txt files never leak a doc_id)
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(encode(substring(
          lower(regexp_replace(col("text"), "\\s+", " ")), 1, 32),
          "utf-8")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === direct.size)
    out.foreach { case (id, m, _) => assert(direct(id) === m) }
    // the three pair sets, independently derived
    val bytePairs = direct.toSeq.groupBy(_._2).values
      .filter(_.size > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        ids.combinations(2).map(p => (p(0), p(1)))
      }.toSeq
    val textPairs = operators.Dedup.cachedNgramPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val embPairs = operators.Similarity.cachedEmbedPairs(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bytePairs.nonEmpty && textPairs.nonEmpty && embPairs.nonEmpty,
      "fixture no longer exercises all three modalities")
    val union = (bytePairs ++ textPairs ++ embPairs).toSet
    // every per-modality pair is co-clustered in the fused partition
    union.foreach { case (a, b) =>
      assert(fused(a) === fused(b), s"pair ($a,$b) split across clusters")
    }
    // and the fused labels ARE union-find over the union — no more
    // merging than the three modalities justify (min-root union keeps
    // each component's root at its min id, the canonical contract)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    union.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    fused.foreach { case (id, c) =>
      assert(c === find(id), s"doc $id: fused $c vs union-find ${find(id)}")
    }
  }
}
