package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Quality probe for the composed OPQ-IVFADC index (q_ann_opq_ivfpq):
  * end-to-end reconstruction MSE (coarse + residual decode vs the true
  * vector) for the plain IVFPQ pipeline and the rotated one, on the
  * corpus at SPARK_GRAFT_SF_DIR. The coarse step is exact in both, so
  * E‖x − x̂‖² = E‖res − decode(res)‖² and the two pipelines compare on
  * the same objective despite clustering in different bases. */
object OpqIvfProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = 8; val subDim = 8
    val e = Similarity.prepare(graft.Tables.embeddings(spark, d))
      .filter(col("vec_id") =!= 0L).localCheckpoint()

    def residualFrame(codes: DataFrame, coarse: DataFrame,
        vecs: DataFrame): DataFrame =
      codes.select("vec_id", "a_id")
        .join(vecs.select(col("vec_id"), col("ce")), "vec_id")
        .join(broadcast(coarse.select(col("c_id").as("a_id"),
          col("centroid"))), "a_id")
        .select(col("vec_id"),
          zip_with(col("ce"), col("centroid"), (a, b) => a - b).as("ce"))

    val (coarseP, cbP, codesP) = Similarity.ivfPqIndex(spark, d)
    val mseP = Similarity.pqReconstructionMse(
      residualFrame(codesP, coarseP, e), cbP, m, subDim)

    val (rot, coarseO, cbO, codesO) = Similarity.opqIvfPqIndex(spark, d)
    val er = Similarity.rotated(e, rot, 64).localCheckpoint()
    val mseO = Similarity.pqReconstructionMse(
      residualFrame(codesO, coarseO, er), cbO, m, subDim)

    println(s"mse_ivfpq=$mseP mse_opq_ivfpq=$mseO ratio=${mseO / mseP}")
    spark.stop()
  }
}
