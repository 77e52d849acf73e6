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

  test("exhaustive IVFADC (all lists + corpus shortlist) is exactly " +
      "brute force") {
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val got = Similarity.qAnnIvfPqExhaustive(spark, sf).collect()
      .map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
  }

  test("batched IVFADC: exhaustive probing equals per-query brute force " +
      "over the 16-query batch; pruned recall rows are non-degenerate") {
    // both sides exclude vec_id 0 (the single-query probe is not in the
    // codes corpus) and each query excludes itself
    val brute = Similarity.cosineTopKBatch(
      Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0L),
      1L to 16L, 10).collect().map(_.toSeq)
    val got = Similarity.qAnnIvfPqBatchExhaustive(spark, sf).collect()
      .map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
    val rec = Similarity.qAnnIvfPqBatchRecall(spark, sf).collect()
    assert(rec.length === 16)
    assert(rec.forall(_.getAs[Long]("truth_k") === 10L))
    // same dominance-not-absolute discipline as the single-query row:
    // near-random fixture scatters true neighbors across lists, so the
    // BATCH MEAN clearing 0.4 rules out collapsed LUTs without pinning
    // fixture luck per query
    val mean = rec.map(_.getAs[Double]("recall")).sum / rec.length
    assert(mean >= 0.4, s"batch ivfpq mean recall $mean")
  }

  test("pruned IVFADC recall row is self-validating and non-degenerate") {
    val r = Similarity.qAnnIvfPqRecall(spark, sf).head()
    assert(r.getAs[Long]("brute_k") === 10L)
    // the fixture's embeddings are near-random, so true neighbors
    // scatter across coarse lists and nprobe=3/10 bounds what ANY
    // IVF-family probe can recall (the same reason DedupSpec asserts
    // multiprobe DOMINANCE rather than an absolute). 0.4 rules out a
    // collapsed codebook/LUT while staying a property of the operator,
    // not of fixture luck; exactness is carried by the exhaustive twin's
    // hard oracle above.
    assert(r.getAs[Double]("recall") >= 0.4,
      s"ivfpq recall ${r.getAs[Double]("recall")}")
  }

  test("residual PQ reconstructs better than plain PQ at equal bits " +
      "(why IVFADC quantizes residuals)") {
    import graft.functions.VectorFunctions.dotd
    val e = Similarity.prepare(Tables.embeddings(spark, sf))
      .filter(col("vec_id") =!= 0L)
    // total squared reconstruction error of a codebook over vectors
    def reconErr(vecs: org.apache.spark.sql.DataFrame,
        cb: org.apache.spark.sql.DataFrame): Double =
      vecs.select(col("vec_id"), col("ce"),
          explode(sequence(lit(0), lit(7))).as("m"))
        .select(col("vec_id"), col("m"),
          expr("slice(ce, m * 8 + 1, 8)").as("sv"))
        .join(broadcast(cb), "m")
        .withColumn("d2",
          col("cn2") - lit(2.0) * dotd(col("sv"), col("centroid")))
        .groupBy("vec_id", "m")
        .agg(min_by(struct(col("centroid"), col("sv")),
          struct(col("d2"), col("c_id"))).as("x"))
        .withColumn("err2", aggregate(
          zip_with(col("x.sv"), col("x.centroid"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (a, x) => a + x))
        .agg(sum("err2")).head().getDouble(0)
    // underfit regime (ksub=16) so the quantizer, not memorization,
    // carries the signal — at ksub=256 on a 500-vector fixture both
    // codebooks nearly memorize the corpus and the gap collapses
    val cbPlain = Similarity.pqCodebook(e, 8, 16, 8, 3)
    val errPlain = reconErr(e, cbPlain)
    // coarse assign (same shape as the index build), then residuals:
    // |x − (c + r̂)|² = |r − r̂|², so reconErr over residuals with the
    // residual codebook IS the composed IVFADC reconstruction error
    val coarse = Similarity.kmeansCentroids(e, 10, 3)
    val res = e.crossJoin(broadcast(coarse))
      .withColumn("d2",
        col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ce"), col("centroid")),
        struct(col("d2"), col("c_id"))).as("m"))
      .select(col("vec_id"),
        zip_with(col("m.ce"), col("m.centroid"), (a, b) => a - b)
          .as("ce"))
    val cbRes = Similarity.pqCodebook(res, 8, 16, 8, 3)
    val errRes = reconErr(res, cbRes)
    assert(errRes < errPlain,
      s"residual recon err $errRes !< plain $errPlain")
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

  test("OPQ rotation is orthonormal and lowers reconstruction error on " +
      "anisotropic data") {
    import spark.implicits._
    val dim = 16; val m = 4; val subDim = 4; val ksub = 8
    val rnd = new scala.util.Random(42)
    // adversarial-for-plain-PQ geometry: ALL the variance lives in the
    // first coordinate block, so plain PQ spends one block's ksub
    // centroids on everything that matters and wastes the other three.
    // OPQ's eigenvalue allocation spreads the high-variance directions
    // one per block.
    val rows = (1L to 512L).map { id =>
      (id, Array.tabulate(dim)(i =>
        (if (i < subDim) 10.0 else 0.1) * rnd.nextGaussian()).toSeq)
    }
    val e = rows.toDF("vec_id", "ce")
    val cov = Similarity.covarianceMatrix(e, dim)
    val rot = Similarity.opqRotation(cov, dim, m)
    // R·Rᵀ = I — rotation preserves dot products and norms
    for (i <- 0 until dim; j <- 0 until dim) {
      var acc = 0.0
      for (k2 <- 0 until dim) acc += rot(i * dim + k2) * rot(j * dim + k2)
      assert(math.abs(acc - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt($i,$j)=$acc")
    }
    val er = Similarity.rotated(e, rot, dim)
    val cbP = Similarity.pqCodebook(e, m, ksub, subDim, iters = 2)
    val cbO = Similarity.pqCodebook(er, m, ksub, subDim, iters = 2)
    val msePq = Similarity.pqReconstructionMse(e, cbP, m, subDim)
    val mseOpq = Similarity.pqReconstructionMse(er, cbO, m, subDim)
    assert(mseOpq < msePq, s"opq mse $mseOpq !< pq mse $msePq")
  }

  test("sampled rotation training ≈ full-corpus training: the deployed " +
      "hash-capped sample reconstructs within noise of the full pass") {
    // At sf0.1 the 2000-vector corpus exceeds OpqTrainCap (1024), so
    // the deployed path genuinely trains the rotation on the salted
    // hash sample. The rotation is index metadata whose quality
    // saturates long before corpus scale (the FAISS practice this
    // mirrors): codebooks trained in the sample-rotated space must
    // reconstruct the corpus within a few percent of codebooks trained
    // in the full-covariance-rotated space.
    val dim = 64; val m = 8; val ksub = 16; val subDim = 8
    val e = Similarity.prepare(
      Tables.embeddings(spark, "/root/testdata/sf0.1"))
      .filter(col("vec_id") =!= 0L).localCheckpoint()
    val full = e.count()
    val sample = Similarity.opqTrainSample(e).localCheckpoint()
    val kept = sample.count()
    assert(kept < full, s"cap did not engage: $kept of $full")
    assert(kept > Similarity.OpqTrainCap / 2, s"sample collapsed: $kept")
    def mseWith(train: org.apache.spark.sql.DataFrame): Double = {
      val rot = Similarity.opqRotation(
        Similarity.covarianceMatrix(train, dim), dim, m)
      val er = Similarity.rotated(e, rot, dim).localCheckpoint()
      val cb = Similarity.pqCodebook(er, m, ksub, subDim, iters = 2)
      Similarity.pqReconstructionMse(er, cb, m, subDim)
    }
    val mseFull = mseWith(e)
    val mseSampled = mseWith(sample)
    assert(mseSampled <= mseFull * 1.10,
      s"sampled-rotation mse $mseSampled vs full $mseFull")
  }

  test("the rotation-training sample is a pure function of ids: " +
      "identical membership across partition layouts and runs") {
    // The corpus-size-independence claim rests on the sample being
    // DETERMINISTIC — a rand()-style sample would retrain a different
    // rotation per run and layout, breaking artifact reproducibility.
    val e = Similarity.prepare(
      Tables.embeddings(spark, "/root/testdata/sf0.1"))
      .filter(col("vec_id") =!= 0L)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.opqTrainSample(df).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val a = ids(e)
    assert(a === ids(e.repartition(7)), "layout changed the sample")
    assert(a === ids(e), "re-run changed the sample")
    assert(a.size < e.count(), "cap did not engage at sf0.1")
  }

  test("non-parametric OPQ: the Procrustes alternation is objective-" +
      "monotone and reconstructs at least as well as parametric OPQ " +
      "on anisotropic data") {
    import spark.implicits._
    val dim = 16; val m = 4; val subDim = 4; val ksub = 8
    val rnd = new scala.util.Random(7)
    // correlated anisotropy ACROSS block boundaries: pairs of
    // coordinates in different blocks mix a shared Gaussian, so the
    // PCA basis alone (parametric OPQ) leaves structure the data-driven
    // Procrustes refinement can still exploit
    val rows = (1L to 512L).map { id =>
      val g = Array.fill(dim)(rnd.nextGaussian())
      val v = Array.tabulate(dim) { i =>
        if (i < subDim) 8.0 * g(i) + 3.0 * g(i + subDim)
        else if (i < 2 * subDim) 6.0 * g(i) - 3.0 * g(i - subDim)
        else 0.2 * g(i)
      }
      (id, v.toSeq)
    }
    val e = rows.toDF("vec_id", "ce").localCheckpoint()
    val rotP = Similarity.opqRotation(
      Similarity.covarianceMatrix(e, dim), dim, m)
    val erP = Similarity.rotated(e, rotP, dim).localCheckpoint()
    var cb = Similarity.pqCodebook(erP, m, ksub, subDim, iters = 2)
    val mseParam = Similarity.pqReconstructionMse(erP, cb, m, subDim)
    // two full alternations: encode → Procrustes → warm-started retrain
    var rot = rotP
    var er = erP
    var mseNp = mseParam
    for (_ <- 1 to 2) {
      val codes = Similarity.pqEncode(er, cb, m, subDim)
      rot = Similarity.procrustesRotation(e, codes, cb, dim, m)
      er = Similarity.rotated(e, rot, dim).localCheckpoint()
      cb = Similarity.pqCodebook(er, m, ksub, subDim, iters = 2,
        Some(Similarity.centroidsFromCodes(er, codes, m, subDim)))
      val mseNext = Similarity.pqReconstructionMse(er, cb, m, subDim)
      // every alternation is objective-non-increasing: Procrustes is
      // the fixed-codes optimum, the warm start is the fixed-assignment
      // mean optimum, Lloyd's only descends from there (tiny tolerance
      // for the exact-decimal mean rounding)
      assert(mseNext <= mseNp * (1 + 1e-6),
        s"alternation raised mse: $mseNp -> $mseNext")
      mseNp = mseNext
    }
    // the refined rotation is still orthonormal
    for (i <- 0 until dim; j <- 0 until dim) {
      var acc = 0.0
      for (k2 <- 0 until dim) acc += rot(i * dim + k2) * rot(j * dim + k2)
      assert(math.abs(acc - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt($i,$j)=$acc")
    }
    assert(mseNp <= mseParam * (1 + 1e-6),
      s"np mse $mseNp > parametric $mseParam")
  }

  test("non-parametric OPQ on the corpus: exhaustive equals brute " +
      "force; batched recall does not lose to plain PQ") {
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val got = Similarity.qAnnOpqNpExhaustive(spark, sf).collect()
      .map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
    val r = Similarity.qAnnOpqRecall(spark, sf).head()
    assert(r.getAs[Double]("recall_opq_np") >=
      r.getAs[Double]("recall_pq"), r.toString)
  }

  test("composed OPQ-IVFADC: exhaustive equals brute force; the rotated " +
      "pipeline reconstructs no worse end-to-end than plain IVFPQ") {
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val got = Similarity.qAnnOpqIvfPqExhaustive(spark, sf).collect()
      .map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
    // End-to-end reconstruction: the coarse step is exact in both
    // pipelines, so E‖x − x̂‖² = E‖res − decode(res)‖² and the two
    // compare on the same objective despite clustering in different
    // bases (measured 0.094 vs 0.099 on this corpus).
    val m = 8; val subDim = 8
    val e = Similarity.prepare(Tables.embeddings(spark, sf))
      .filter(col("vec_id") =!= 0L).localCheckpoint()
    def residualFrame(codes: org.apache.spark.sql.DataFrame,
        coarse: org.apache.spark.sql.DataFrame,
        vecs: org.apache.spark.sql.DataFrame) =
      codes.select("vec_id", "a_id")
        .join(vecs.select(col("vec_id"), col("ce")), "vec_id")
        .join(broadcast(coarse.select(col("c_id").as("a_id"),
          col("centroid"))), "a_id")
        .select(col("vec_id"),
          zip_with(col("ce"), col("centroid"), (a, b) => a - b).as("ce"))
    val (coarseP, cbP, codesP) = Similarity.ivfPqIndex(spark, sf)
    val mseP = Similarity.pqReconstructionMse(
      residualFrame(codesP, coarseP, e), cbP, m, subDim)
    val (rot, coarseO, cbO, codesO) = Similarity.opqIvfPqIndex(spark, sf)
    val er = Similarity.rotated(e, rot, 64).localCheckpoint()
    val mseO = Similarity.pqReconstructionMse(
      residualFrame(codesO, coarseO, er), cbO, m, subDim)
    assert(mseO <= mseP, s"composed OPQ-IVFADC mse $mseO > plain $mseP")
    // serving recall row self-validates
    val r = Similarity.qAnnOpqIvfPqRecall(spark, sf).head()
    assert(r.getAs[Long]("brute_k") === 10L)
    val rc = r.getAs[Double]("recall")
    assert(rc >= 0.0 && rc <= 1.0)
  }

  test("OPQ on the corpus: exhaustive equals brute force; recall row " +
      "does not lose to plain PQ") {
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val got = Similarity.qAnnOpqExhaustive(spark, sf).collect()
      .map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
    val r = Similarity.qAnnOpqRecall(spark, sf).head()
    // 16-query batch × top-10 truth rows
    assert(r.getAs[Long]("brute_k") === 160L)
    assert(r.getAs[Double]("recall_opq") >= r.getAs[Double]("recall_pq"),
      r.toString)
  }

  test("declared rebalanced IVF: the split path genuinely engages on " +
      "the corpus and exhaustive probing is exactly brute force") {
    val (assigned, cents) = Similarity.rebalancedIvfIndex(spark, sf)
    // cap = n/20 with k=10 forces over-cap lists to split: the centroid
    // table must be finer than the base quantizer's k
    assert(cents.count() > 10, "split path never engaged")
    // membership preserved exactly through split/reassign
    val n = Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0L).count()
    assert(assigned.count() === n)
    assert(assigned.select("vec_id").distinct().count() === n)
    val brute = Similarity.qCosineTopk(spark, sf).collect().map(_.toSeq)
    val got = Similarity.qAnnIvfRebalancedExhaustive(spark, sf)
      .collect().map(_.toSeq)
    assert(got.toSeq === brute.toSeq)
  }

  test("IVF list rebalance: splitting hot lists bounds imbalance and " +
      "preserves membership (skewed list distribution probe)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dims = 16
    // skewed list distribution: 80% of the corpus in one tight blob
    val hub = Array.fill(dims)(rnd.nextGaussian())
    val vecs = (0L until 400L).map { i =>
      if (i < 320) (i, hub.map(x => x + rnd.nextGaussian() * 0.05))
      else (i, Array.fill(dims)(rnd.nextGaussian() * 2))
    }
    val df = vecs.map { case (id, v) => (id, "x", v.map(_.toFloat)) }
      .toDF("vec_id", "label", "embedding")
    def imbalance(a: org.apache.spark.sql.DataFrame): Double = {
      val pops = a.groupBy("c_id").count().select("count")
        .collect().map(_.getLong(0))
      pops.max.toDouble / (pops.sum.toDouble / pops.length)
    }
    val (a0, _) = Similarity.quantizeCapped(df, k = 8, iters = 2,
      cap = Int.MaxValue)
    val (a1, c1) = Similarity.quantizeCapped(df, k = 8, iters = 2,
      cap = 80)
    val imb0 = imbalance(a0); val imb1 = imbalance(a1)
    assert(imb0 > 2.0, s"fixture not skewed: imbalance $imb0")
    assert(imb1 < imb0, s"rebalance ineffective: $imb0 -> $imb1")
    // the hot list is genuinely split and the new max is cap-bounded
    // (2× slack: sub-k-means balances approximately, not perfectly)
    val maxPop = a1.groupBy("c_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPop < 320, s"hot list survived: max $maxPop")
    assert(maxPop <= 160, s"split max $maxPop exceeds 2x cap")
    assert(c1.count() > 8, "splitting must add sub-centroids")
    // rebalancing re-partitions the corpus — it must never lose or
    // duplicate a vector (search over the probed union stays exact)
    assert(a1.count() === 400)
    assert(a1.select("vec_id").distinct().count() === 400)
  }
}
