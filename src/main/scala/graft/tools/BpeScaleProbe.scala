package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.TextAnalysis

/** BPE batched-trainer probe at a REALISTIC merge count (VERDICT r10
  * item 7): the declared keys train 8 merges for oracle-ability; a
  * production tokenizer trains thousands. This probe runs
  * [[TextAnalysis.bpeTrainBatched]] to 1,000+ merges over the Zipf
  * organic corpus (OrganicProbe.zipfBase — the long-tail vocabulary
  * real text has) and reports rounds / wall vs merge count and corpus
  * decade, to pin the scale claim that batched BPE training cost is
  * VOCABULARY-sized after one corpus pass: the corpus appears only in
  * the initial word-frequency aggregation; every training round runs
  * on the ≤|vocab| distinct-word table, so a 100 TB corpus trains in
  * (one corpus-pass agg) + (merges/batchCap) vocab-sized rounds.
  */
object BpeScaleProbe {

  private def words(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = args.headOption.map(_.toInt).getOrElse(1000)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(64)

    for (nDocs <- Seq(5000, 50000)) {
      val base = OrganicProbe.zipfBase(spark, nDocs)
      val t0 = System.nanoTime()
      val w = words(base).localCheckpoint()
      val nTypes = w.count()
      val tAgg = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (trace, _) = TextAnalysis.bpeTrainBatched(w, merges, cap)
      val tTrain = (System.nanoTime() - t1) / 1e9
      val rounds = if (trace.isEmpty) 0 else trace.map(_._1).max
      println(f"BPEPROBE docs=$nDocs%d types=$nTypes%d " +
        f"merges=${trace.size}%d/$merges%d cap=$cap%d rounds=$rounds%d " +
        f"agg=$tAgg%.1fs train=$tTrain%.1fs " +
        f"perRound=${tTrain / math.max(rounds, 1)}%.2fs")
    }
    spark.stop()
  }
}
