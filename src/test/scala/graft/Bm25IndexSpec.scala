package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The persisted BM25 postings index: hive layout by term-hash bucket,
  * partition-pruned probes, and row-identity with the in-memory batch
  * search. This is the text retrieval analog of IvfIndexSpec — the
  * on-disk artifact backing the "a query batch reads its matched
  * buckets, not the whole postings table" scale claim. */
class Bm25IndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("index probe is partition-pruned to the batch's matched buckets") {
    val dir = Files.createTempDirectory("graft_bm25").toString
    TextAnalysis.writeBm25Index(spark, sf, dir, nBuckets = 64)
    val dirs = new java.io.File(dir).listFiles()
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
    assert(probe.select("q_id").distinct().count() <= 2)
  }

  test("probing the persisted index equals the in-memory batch search") {
    // Same query batch, same scoring tail — the hive layout and the
    // parquet roundtrip of the rounded per-(doc,tok) scores cannot
    // change results. This row-identity is why q_bm25_index_probe
    // shares q_bm25_search's oracle BY REFERENCE.
    val mem = TextAnalysis.qBm25Search(spark, sf)
      .collect().map(_.toSeq).toSeq
    val idx = TextAnalysis.qBm25IndexProbe(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(idx === mem)
  }
}
