package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.Tables

/** Sampled vs full-corpus OPQ rotation training (VERDICT r10 item 5):
  * reports reconstruction MSE of codebooks trained in the
  * sample-rotated vs full-covariance-rotated space, plus the
  * covariance-pass wall for each — the evidence that rotation quality
  * saturates at the hash-capped sample while the training cost becomes
  * corpus-size-independent. */
object OpqSampleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64; val m = 8; val subDim = 8; val ksub = 16
    val e = Similarity.prepare(Tables.embeddings(spark, d))
      .filter(col("vec_id") =!= 0L).localCheckpoint()
    val full = e.count()
    val sample = Similarity.opqTrainSample(e).localCheckpoint()
    val kept = sample.count()
    def run(train: org.apache.spark.sql.DataFrame, label: String)
        : Unit = {
      val t0 = System.nanoTime()
      val cov = Similarity.covarianceMatrix(train, dim)
      val tCov = (System.nanoTime() - t0) / 1e9
      val rot = Similarity.opqRotation(cov, dim, m)
      val er = Similarity.rotated(e, rot, dim).localCheckpoint()
      val cb = Similarity.pqCodebook(er, m, ksub, subDim, iters = 2)
      val mse = Similarity.pqReconstructionMse(er, cb, m, subDim)
      println(f"OPQSAMPLE $label%-8s n=${train.count()}%d " +
        f"cov=$tCov%.2fs mse=$mse%.6f")
    }
    println(s"corpus=$full sampleKept=$kept cap=${Similarity.OpqTrainCap}")
    run(e, "full")
    run(sample, "sampled")
    spark.stop()
  }
}
