package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The in-engine model-based quality classifier (q_quality_lr_train /
  * q_quality_lr_score). The DuckDB oracle already hash-proves the full
  * 24-iteration GD recurrence bit-for-bit; these pin the LEARNING
  * properties the hash can't see: the model actually fits the weak
  * labels (beats majority class), squared loss genuinely falls under
  * training, reruns are bit-identical, and the emitted gate is
  * self-consistent.
  */
class QualityLrSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("GD training is bit-deterministic: two runs produce identical " +
      "weight traces") {
    val docs = Tables.documents(spark, sf)
    def run() = TextAnalysis.lrTrainTrace(docs)
      .map { case (i, w) => (i, w.toSeq) }
    assert(run() === run())
  }

  test("the trained gate fits its weak labels: accuracy beats the " +
      "majority baseline and clears 0.9") {
    val out = operators.TextAnalysis.qQualityLrScore(spark, sf)
      .select(col("keep"), col("y")).collect()
    val n = out.length.toDouble
    val acc = out.count(r => r.getInt(0) == r.getInt(1)) / n
    val majority = math.max(
      out.count(_.getInt(1) == 1), out.count(_.getInt(1) == 0)) / n
    assert(acc > majority, s"acc $acc <= majority $majority")
    assert(acc >= 0.9, s"acc $acc")
  }

  test("the gate GENERALIZES: held-out accuracy at the 0.5 operating " +
      "point clears 0.85") {
    // q_quality_lr_holdout trains on the even doc_ids and sweeps the
    // PR table over the odd half the trainer never saw. Accuracy at
    // t=0.5 recovers from the declared output: tn = N - tp - fp - fn.
    val pr = operators.TextAnalysis.qQualityLrHoldout(spark, sf)
      .filter(col("t") === 0.5).head()
    val n = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(2L)) === 1).count()
    val tp = pr.getAs[Long]("tp"); val fp = pr.getAs[Long]("fp")
    val fn = pr.getAs[Long]("fn")
    val acc = (tp + (n - tp - fp - fn)).toDouble / n
    assert(acc >= 0.85, s"held-out acc $acc (tp=$tp fp=$fp fn=$fn n=$n)")
  }

  test("the SAMPLED trainer matches the full-corpus gate: 256-doc " +
      "hash-capped training loses almost nothing at full-corpus scoring") {
    // q_quality_lr_pr_sampled trains on the deterministic 256-doc
    // sample (corpus-size-independent — the deployed shape) and sweeps
    // the PR table over the WHOLE corpus. Accuracy at t=0.5 must clear
    // the same 0.9 bar the full-corpus gate does — the sample is a
    // uniform hash draw, so a 5-weight model trained on 256 docs has to
    // recover the same separating surface.
    val n = Tables.documents(spark, sf).count()
    def accAt05(pr: org.apache.spark.sql.DataFrame): Double = {
      val r = pr.filter(col("t") === 0.5).head()
      val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
      val fn = r.getAs[Long]("fn")
      (tp + (n - tp - fp - fn)).toDouble / n
    }
    val sampled = accAt05(
      operators.TextAnalysis.qQualityLrPrSampled(spark, sf))
    val full = accAt05(operators.TextAnalysis.qQualityLrPr(spark, sf))
    assert(sampled >= 0.9, s"sampled-trained acc $sampled")
    assert(sampled >= full - 0.05,
      s"sampled gate lost too much: $sampled vs full $full")
    // and the sample really is capped: the trace exists and training
    // saw at most 256 docs (cap < corpus at this sf)
    assert(n > 256, "sf0.01 corpus should exceed the cap")
    val trace = operators.TextAnalysis
      .qQualityLrTrainSampled(spark, sf).collect()
    assert(trace.length === 24)
  }

  test("squared loss falls over the training run (first iteration's " +
      "weights vs last)") {
    val docs = Tables.documents(spark, sf)
    val trace = TextAnalysis.lrTrainTrace(docs)
    def loss(w: Array[Double]): Double = {
      // rebuild the feature math inline (the spec owns this small
      // duplication — it is the independent check of lrFeatures)
      val feats = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"),
          concat(lit(" "), col("text"), lit(" ")).as("padded"))
        .select(col("doc_id"),
          least(lit(1.0),
            size(split(trim(col("text")), "\\s+")).cast("double") /
              lit(100.0)).as("x1"),
          least(lit(1.0),
            length(col("text")).cast("double") / lit(500.0)).as("x2"),
          when(length(col("padded")) -
            length(expr("replace(padded, ' the ', '')")) > 0, 1.0)
            .otherwise(0.0).as("x3"),
          (size(array_distinct(split(trim(col("text")), "\\s+")))
            .cast("double") /
            size(split(trim(col("text")), "\\s+")).cast("double"))
            .as("x4"))
        .withColumn("y",
          when(lit(0.4) * col("x1") + lit(0.4) * col("x2") +
            lit(0.2) * col("x3") >= 0.7, 1.0).otherwise(0.0))
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
      val p = lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
      feats.agg(avg(pow(p - col("y"), 2))).head().getDouble(0)
    }
    val first = loss(trace.head._2)
    val last = loss(trace.last._2)
    assert(last < first, s"loss did not fall: $first -> $last")
  }

  test("the emitted gate is self-consistent: keep == (score >= 0.5) " +
      "and the trace's final row is the scoring model") {
    val rows = operators.TextAnalysis.qQualityLrScore(spark, sf).collect()
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      val keep = r.getAs[Int]("keep")
      // score is p rounded to 6 dp while keep tests the exact z sign, so
      // only scores clear of the 0.5 boundary are sign-conclusive
      if (score > 0.500001) assert(keep === 1, s"row $r")
      if (score < 0.499999) assert(keep === 0, s"row $r")
    }
    val trace = operators.TextAnalysis.qQualityLrTrain(spark, sf)
      .orderBy("iter").collect()
    assert(trace.length === 24)
    // weights move: the last row differs from the first
    assert(trace.last.toSeq.drop(1) !== trace.head.toSeq.drop(1))
  }
}
