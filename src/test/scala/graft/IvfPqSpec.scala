package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product quantization (IVF-PQ) — the 32× ANN compression path
  * (VERDICT r7 item 5).
  *
  * Recall discipline: the re-ranked PQ search must dominate BOTH the
  * raw ADC list (refine buys recall back) and a search over
  * int8-absmax-reconstructed vectors (the compression story PQ
  * replaces at scale: int8 keeps 8 bits/dim = 64 B/vector; PQ keeps
  * 4 bits/dim here = 4 B/vector, and still must not lose to it after
  * refine, because the refine step consults exact vectors).
  */
class IvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("exhaustive-shortlist PQ search is exactly brute force") {
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val pq = Similarity.qAnnPqExhaustive(spark, sf).collect().map(_.toSeq)
    assert(pq.toSeq === brute.toSeq)
  }

  test("codebook training is deterministic: two builds bit-identical") {
    val e = Similarity.prepare(Tables.embeddings(spark, sf))
      .filter(col("vec_id") =!= 0L)
    def build() = Similarity.pqCodebook(e, m = 8, ksub = 16, subDim = 8,
      iters = 2).orderBy("m", "c_id").collect().map(_.toSeq).toSeq
    assert(build() === build())
  }

  test("re-ranked PQ recall dominates raw ADC recall and the " +
      "int8-reconstructed search") {
    val r = Similarity.qAnnPqRecall(spark, sf).head()
    val bruteK = r.getAs[Long]("brute_k")
    val recallAdc = r.getAs[Double]("recall_adc")
    val recallRerank = r.getAs[Double]("recall_rerank")
    assert(bruteK === 10L)
    // int8 baseline: brute-force top-10 over absmax-reconstructed
    // vectors (scale = amax/127, v̂ = round(v/scale)·scale), compared to
    // the exact ground truth
    val e = Similarity.prepare(Tables.embeddings(spark, sf))
    val recon = e
      .withColumn("amax",
        aggregate(col("ce"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("scale", col("amax") / 127)
      .withColumn("rce", transform(col("ce"),
        x => round(x / col("scale")) * col("scale")))
      .select(col("vec_id"), col("rce"))
    val qv = recon.filter(col("vec_id") === 0L)
      .select(col("rce").as("qe"))
    val int8Top = recon.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        (graft.functions.VectorFunctions.dotd(col("rce"), col("qe")) /
          (sqrt(graft.functions.VectorFunctions
            .dotd(col("rce"), col("rce"))) *
           sqrt(graft.functions.VectorFunctions
            .dotd(col("qe"), col("qe"))))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id")
    val truth = Similarity.qCosineTopk(spark, sf).select(col("vec_id"))
    val int8Hits = truth.join(int8Top, Seq("vec_id")).count()
    val recallInt8 = int8Hits.toDouble / bruteK
    assert(recallRerank >= recallAdc,
      s"rerank $recallRerank < adc $recallAdc")
    assert(recallRerank >= recallInt8,
      s"rerank $recallRerank < int8 $recallInt8")
    // and the refine step is genuinely effective, not vacuous
    assert(recallRerank >= 0.9, s"rerank recall $recallRerank")
  }
}
