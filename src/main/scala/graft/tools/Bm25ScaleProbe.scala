package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.Tables
import graft.operators.TextAnalysis

/** BM25-serving scale probe: the persisted partition-pruned postings
  * index (q_bm25_index_probe) measured across corpus decades against
  * the recompute-per-batch baseline (q_bm25_search's in-flight form) —
  * the text-retrieval counterpart of AnnScaleProbe (SCALE.md §13).
  *
  * Serving scenario: a FIXED query batch (the declared 8-query /
  * 24-term more-like-this workload, derived once from the base corpus)
  * against a GROWING corpus — the wave generations are
  * OrganicProbe-style compounding mutations, so postings growth carries
  * the near-dup structure a real crawl has.
  *
  * Per scale: recompute wall (tokenize + tf/df/dl score the whole wave,
  * then rank — what every batch pays with no index), index build wall
  * (one-time, amortized over every batch served), cold + warm probe
  * wall (the warm row is the marginal serving cost), and the matched
  * bucket count (the probe reads |matched|/64 of the postings — the
  * pruning fraction is workload-determined, not corpus-determined, so
  * it holds at any scale).
  */
object Bm25ScaleProbe {

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, d)
    spark.stop()
  }

  def run(spark: SparkSession, d: String): Unit = {
    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // the declared serving workload, fixed across scales (docs 1–8
    // exist unmutated in every wave: generations only ADD id strata)
    val qterms = TextAnalysis.bm25QueryTerms(spark, d).localCheckpoint()
    println(s"== query batch: ${qterms.count()} (q_id, term) rows ==")

    val base = Tables.documents(spark, d).localCheckpoint()
    val x10 = OrganicProbe.organicCorpus(base, 9).localCheckpoint()
    val x100 = OrganicProbe
      .organicCorpus(x10, 9, idOffsetUnit = 1_000_000_000L)
      .localCheckpoint()

    for ((mult, corpus) <- Seq(1 -> base, 10 -> x10, 100 -> x100)) {
      println(s"== bm25 wave x$mult: ${corpus.count()} docs ==")
      // recompute baseline: what q_bm25_search's in-flight postings
      // cost per batch once the corpus is this big
      time(s"recompute batch search x$mult") {
        TextAnalysis.bm25Rank(
          TextAnalysis.bm25ScoredOn(corpus)
            .select(col("doc_id"), col("tok"), col("score"))
            .join(broadcast(qterms), "tok"), 10).collect().length
      }
      val dir = Files.createTempDirectory(s"graft_bm25_x$mult").toString
      time(s"index build (one-time) x$mult") {
        TextAnalysis.writeBm25IndexOn(corpus, dir)
      }
      val nBkts = qterms
        .select(pmod(xxhash64(col("tok")), lit(64L)).cast("int").as("b"))
        .distinct().count()
      println(s"  matched buckets: $nBkts / 64")
      time(s"index probe cold x$mult") {
        TextAnalysis.probeBm25Index(spark, dir, qterms).collect().length
      }
      time(s"index probe warm x$mult") {
        TextAnalysis.probeBm25Index(spark, dir, qterms).collect().length
      }
      // lifecycle cost at this scale: tombstone 10% of docs (metadata
      // write, O(deleted postings) scan), probe through tombstones,
      // physically reclaim, probe the compacted root
      time(s"delete 10pct (tombstone) x$mult") {
        TextAnalysis.deleteFromBm25Index(spark, dir,
          corpus.filter(pmod(col("doc_id"), lit(10L)) === 9)
            .select("doc_id"))
      }
      time(s"probe through tombstones x$mult") {
        TextAnalysis.probeBm25Index(spark, dir, qterms).collect().length
      }
      time(s"compact (root swap) x$mult") {
        TextAnalysis.compactBm25Index(spark, dir)
      }
      time(s"probe post-compact x$mult") {
        TextAnalysis.probeBm25Index(spark, dir, qterms).collect().length
      }
    }
  }
}
