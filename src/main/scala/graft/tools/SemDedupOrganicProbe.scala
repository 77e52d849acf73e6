package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** SemDeDup recall in the ORGANIC regime (VERDICT r11 item 8): the
  * committed 0.39/0.36 recall at τ=0.4 is measured on the testdata
  * embeddings, whose max pair cosine is 0.479 — every qualifying pair
  * is borderline, the worst case for cluster scoping. The published
  * recipe assumes the opposite distribution: a clusterable corpus
  * where true duplicates are ε-close. This probe characterizes recall
  * there, on the deterministic clustered fixture
  * (Similarity.clusteredFixture: separated centers, intra-cluster
  * noise, a planted ε-duplicate per third vector), across two corpus
  * decades:
  *   - τ=0.95 (production SemDeDup territory): the exact pair set is
  *     the planted ε-duplicates — recall is the probability a
  *     duplicate pair co-clusters;
  *   - τ=0.4 (the committed worst-case threshold, now on clusterable
  *     geometry): qualifying pairs are same-TRUE-cluster pairs, so
  *     recall measures how well the trained quantizer recovers the
  *     generating clusters.
  * Also reports the candidate-volume ratio Σ|cluster|²/n² — the n²
  * reduction the clustering buys. Exact pair sets are computed by a
  * broadcast nested-loop brute force (no single-key shuffle), so the
  * probe itself stays parallel.
  */
object SemDedupOrganicProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def brutePairs(prep: DataFrame, tau: Double): DataFrame = {
      val a = prep.select(col("vec_id").as("vec_a"),
        col("ce").as("ce_a"), col("n2").as("n2_a"))
      val b = prep.select(col("vec_id").as("vec_b"),
        col("ce").as("ce_b"), col("n2").as("n2_b"))
      a.crossJoin(broadcast(b))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("sim",
          expr("aggregate(zip_with(ce_a, ce_b, (x, y) -> x * y), " +
            "0D, (acc, v) -> acc + v)") /
            (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
        .filter(col("sim") >= tau)
        .select("vec_a", "vec_b")
    }

    for ((n, k) <- Seq((4000, 16), (12000, 32))) {
      val fx = Similarity.clusteredFixture(spark, n, k, dim = 16,
        noise = 0.35, jitter = 0.02)
      val prep = Similarity.prepare(fx).localCheckpoint()
      val t0 = System.nanoTime()
      val cents = Similarity.kmeansCentroids(prep, k, 3)
      val assigned = Similarity.assignToCentroids(prep, cents)
        .localCheckpoint()
      val tTrain = (System.nanoTime() - t0) / 1e9
      val vol = assigned.groupBy("c_id").count()
        .agg(sum(col("count") * col("count"))).head().getLong(0)
      for (tau <- Seq(0.95, 0.4)) {
        val exact = brutePairs(prep, tau).count()
        val caught = Similarity.semDupPairs(assigned, tau).count()
        println(f"n=$n%-6d k=$k%-3d tau=$tau%4.2f exactPairs=$exact%9d " +
          f"caught=$caught%9d recall=${caught.toDouble / exact}%6.4f " +
          f"candVol=${vol.toDouble / (n.toDouble * n)}%8.6f " +
          f"(train+assign $tTrain%5.1fs)")
      }
    }
    spark.stop()
  }
}
