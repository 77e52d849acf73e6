package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage timing for q_dedup_containment (and the shared shingle pass) —
  * where does the 4.8–5.2 s live? Each stage forced with the noop sink
  * (guide §1.4). */
object DedupPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.operators.Dedup
    val docs = Tables.documents(spark, d)
    // warm the whole key once
    time("warm full") { noop(Dedup.containmentPairs(docs)) }
    for (_ <- 1 to 2) {
      val sh = time("shingle ckpt") {
        Dedup.shingleDocs(docs).localCheckpoint()
      }
      val grams = sh.select(col("doc_id"), col("n"),
        explode(col("sh")).as("g"))
      val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
      time("dfreq") { noop(dfreq) }
      val t = floor((col("n") * 90 + lit(99)) / lit(100))
      val prefix = grams.join(dfreq, "g")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("gdf").asc, col("g").asc)))
        .filter(col("rk") <= col("n") - t + 1)
        .select(col("doc_id").as("doc_a"), col("n").as("n_a"),
          col("g").as("pg"))
      time("prefix window") { noop(prefix) }
      val index = grams.select(col("doc_id").as("doc_b"),
        col("n").as("n_b"), col("g"))
      val cand = prefix.join(index,
          col("pg") === col("g") &&
            col("n_b") * 100 >= col("n_a") * 90 &&
            (col("n_a") < col("n_b") ||
              (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))))
        .select("doc_a", "doc_b", "n_a").distinct()
      time("cand join") { noop(cand) }
      println(s"  cand rows: ${cand.count()}")
      time("full verify") { noop(Dedup.containmentPairs(docs)) }
      time("full clusters") { noop(
        graft.SparkEntry.queries("q_dedup_clusters")(spark, d)) }
      Dedup.clearPairCaches()
    }
    spark.stop()
  }
}
