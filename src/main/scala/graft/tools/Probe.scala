package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch micro-profiler for optimization work (not part of the driver
  * contract). Times labelled sub-plans of the hot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $label ($n rows)")
    }

    val docs = Tables.documents(spark, d)
    time("documents scan")(docs.count())
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("toks"))
    time("tokenize")(toks.select(sum(size(col("toks")))).count())
    val bigrams = toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1))).as("bg"))
    time("bigrams HOF")(bigrams.select(sum(size(col("bg")))).count())
    val hashed = bigrams.select(col("doc_id"),
      array_sort(array_distinct(transform(col("bg"), b => xxhash64(b))))
        .as("sh"))
    time("hash+sort+distinct")(hashed.select(sum(size(col("sh")))).count())
    time("full shingled again")(hashed.count())

    time("q_dedup_ngram_jaccard")(
      graft.operators.Dedup.qDedupNgramJaccard(spark, d).count())
    time("q_dedup_minhash full")(
      graft.operators.Dedup.qDedupMinhash(spark, d).count())
    spark.stop()
  }
}
