package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.Tables

/** Phase timing for the q_stream_bm25_lifecycle maintenance cycle —
  * where does the per-pass cost live (clone/delete/compact/probe)? */
object Bm25PhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val root = s"${sys.props("java.io.tmpdir")}/graft_bm25probe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val docs = Tables.documents(spark, d)
    // segmented build (3 segments, like the streamed replay)
    time("segments") {
      for (i <- 0 until 3)
        TextAnalysis.writeBm25Segment(
          docs.filter(pmod(col("doc_id"), lit(3L)) === i), root, i.toLong)
    }
    for (pass <- 1 to 2) {
      val c = s"${root}_c$pass"
      time("clone") {
        Seq("postings", "doclens", "stats").foreach { sub =>
          org.apache.hadoop.fs.FileUtil.copy(fs,
            new org.apache.hadoop.fs.Path(s"$root/$sub"), fs,
            new org.apache.hadoop.fs.Path(s"$c/$sub"), false, true,
            spark.sparkContext.hadoopConfiguration)
        }
      }
      time("delete") {
        TextAnalysis.deleteFromBm25Index(spark, c,
          docs.filter(pmod(col("doc_id"), lit(10L)) === 9)
            .select("doc_id"))
      }
      time("compact") { TextAnalysis.compactBm25Index(spark, c) }
      time("probe") {
        TextAnalysis.probeBm25Index(spark, c,
          TextAnalysis.bm25QueryTermsOn(TextAnalysis.bm25LiveDocs(spark, d)))
          .collect().length
      }
      fs.delete(new org.apache.hadoop.fs.Path(c), true)
    }
    spark.stop()
  }
}
