package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Segment-count rent for the streaming-segmented BM25 index: the
  * §15/§15b tables measured tombstone rent; this measures the OTHER
  * accumulation cost — how probe latency grows with the number of
  * epoch segments a standing ingest has landed, and what one
  * compaction pass buys back. The same 50k-doc organic corpus is
  * landed as E segments (E = 1, 4, 16, 64: a merge-cadence sweep),
  * probed warm, compacted, and probed again — the measured basis for
  * "compact when segment-count rent exceeds one reclaim pass". */
object SegmentRentProbe {
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
    val qterms = TextAnalysis.bm25QueryTerms(spark, d).localCheckpoint()
    val base = Tables.documents(spark, d).localCheckpoint()
    val corpus = OrganicProbe.organicCorpus(base, 9).localCheckpoint()
    val n = corpus.count()
    println(s"== segment-rent sweep over $n docs ==")
    for (e <- Seq(1, 4, 16, 64)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_segrent_$e"
      val (_, tLand) = time {
        for (i <- 0 until e)
          TextAnalysis.writeBm25Segment(
            corpus.filter(pmod(col("doc_id"), lit(e.toLong)) === i),
            root, i.toLong)
      }
      def files(): Int = {
        def cnt(f: java.io.File): Int =
          if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
          else Option(f.listFiles()).map(_.map(cnt).sum).getOrElse(0)
        cnt(new java.io.File(s"$root/postings"))
      }
      // warm probe: best of two (first pays FS listing)
      val (_, p0) = time {
        TextAnalysis.probeBm25Index(spark, root, qterms).collect() }
      val (_, p1) = time {
        TextAnalysis.probeBm25Index(spark, root, qterms).collect() }
      val fPre = files()
      val (_, tCompact) = time { TextAnalysis.compactBm25Index(spark, root) }
      val (_, pc) = time {
        TextAnalysis.probeBm25Index(spark, root, qterms).collect() }
      println(f"E=$e%-3d land=$tLand%6.2fs files=$fPre%5d " +
        f"probe=${math.min(p0, p1)}%5.2fs compact=$tCompact%6.2fs " +
        f"probePost=$pc%5.2fs postFiles=${files()}%d")
    }
    spark.stop()
  }
}
