package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation-operator behavior on constructed corpora (the DuckDB oracle
  * covers the fixtures; these pin the semantics on planted cases). */
class CurationSpec extends SparkSpec {

  test("sequence packing cuts at boundaries and splits straddling docs") {
    import spark.implicits._
    // source s1: 5 + 6 + 4 tokens, maxLen 8 → seq0 holds doc1 + 3 tokens
    // of doc2, seq1 the rest of doc2 + doc3 (7 tokens, the short tail)
    val docs = Seq(
      ("s1", 1L, "t t t t t"), ("s1", 2L, "t t t t t t"),
      ("s1", 3L, "t t t t"), ("s2", 4L, "t t t"))
      .toDF("source", "doc_id", "text")
    val out = Curation.packSequences(docs, 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("s1", 0L, 2L, 8L, 1L, 2L), ("s1", 1L, 2L, 7L, 2L, 3L),
      ("s2", 0L, 1L, 3L, 4L, 4L)))
  }

  test("packing conserves tokens: full sequences except each shard tail") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val out = Curation.packSequences(docs, 512).cache()
    try {
      // every sequence but the per-source last carries exactly 512 tokens
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val nonTail = out
        .withColumn("max_seq", max("seq_id").over(w))
        .filter(col("seq_id") < col("max_seq"))
      assert(nonTail.filter(col("n_tokens") =!= 512).isEmpty)
      // token conservation per source
      val packed = out.groupBy("source")
        .agg(sum("n_tokens").as("t")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val direct = docs.groupBy("source")
        .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(packed === direct)
    } finally out.unpersist()
  }

  test("decontamination flags a planted benchmark copy maximally") {
    import spark.implicits._
    val bench = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // exact copy of the benchmark doc → every 4-gram overlaps (7 of them)
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // partial: shares exactly one 4-gram window
      (2L, "alpha beta gamma delta unrelated words follow here now ok"),
      // clean: no shared 4-gram
      (3L, "completely different content with no overlap at all here"))
      .toDF("doc_id", "text")
    val got = Curation.decontaminate(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === 7L, got.toString)
    assert(got(2L) === 1L, got.toString)
    assert(!got.contains(3L), got.toString)
  }

  test("repetition signals separate looped text from varied text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    // same expressions as qRepetitionScore, over the constructed frame
    val t = split(trim(col("text")), "\\s+")
    val bg = transform(sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val topCnt = array_max(transform(array_distinct(t),
      u => size(filter(t, x => x === u))))
    val scored = docs.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg))
        .as("rep"),
      (topCnt.cast("double") / size(t)).as("top"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val Array((_, repSpam, topSpam), (_, repVaried, topVaried)) = scored
    assert(repSpam > 0.85 && topSpam === 1.0, scored.mkString(","))
    assert(repVaried === 0.0 && topVaried === 0.1, scored.mkString(","))
  }

  test("IQR fences and decile cutpoints keep an ulp-safe margin from " +
      "every data value (cross-engine bit-identity precondition)") {
    // qOutlierIqr / qEquidepthBins hash-match DuckDB only while no data
    // value sits within engine-interpolation ulp distance of a fence or
    // cutpoint — this pins that precondition loudly so a future fixture
    // change that breaks it fails HERE, not as an opaque hash drift.
    val sf = "/root/testdata/sf0.01"
    val eps = 1e-6
    val e = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val fences = e.groupBy("event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"))
      .select(col("event_type"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    val nearFence = e.join(fences, "event_type")
      .filter((abs(col("value") - col("lo")) < eps &&
          col("value") =!= col("lo")) ||
        (abs(col("value") - col("hi")) < eps && col("value") =!= col("hi")))
      .count()
    assert(nearFence === 0L, s"$nearFence values within $eps of a fence")
    val o = Tables.orders(spark, sf).select(col("o_totalprice").as("v"))
    val cuts = o.agg(expr(
      "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("cuts"))
    val nearCut = o.crossJoin(broadcast(cuts))
      .filter(exists(col("cuts"),
        c => abs(col("v") - c) < eps && col("v") =!= c))
      .count()
    assert(nearCut === 0L, s"$nearCut values within $eps of a cutpoint")
  }

  test("domain mix keeps odd sources whole and downsamples even ones") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.qDomainMix(spark, sf)
    val docs = Tables.documents(spark, sf)
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val oddIn = docs.filter(pmod(srcNum, lit(2)) === 1).count()
    val oddOut = out.filter(pmod(srcNum, lit(2)) === 1).count()
    val evenIn = docs.filter(pmod(srcNum, lit(2)) === 0).count()
    val evenOut = out.filter(pmod(srcNum, lit(2)) === 0).count()
    assert(oddOut === oddIn) // odd sources untouched
    val rate = evenOut.toDouble / evenIn
    assert(rate > 0.25 && rate < 0.55, s"even-source rate $rate")
    // weights undo the mix: sum of weights ≈ original count per parity
    val wSum = out.filter(pmod(srcNum, lit(2)) === 0)
      .agg(sum("weight")).head().getDouble(0)
    assert(math.abs(wSum - evenIn) / evenIn < 0.35,
      s"weighted even mass $wSum vs $evenIn")
  }

  test("temperature mixture up-weights small domains: the 10-doc domain " +
    "keeps everything at weight 1, keep-rates fall with domain size, " +
    "and weights undo the resample") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.qDomainMixTemperature(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .withColumn("dom", concat(lit("d"),
        length(pmod(col("doc_id"), lit(500)).cast("string"))))
    val inSize = docs.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inSize === Map("d1" -> 10L, "d2" -> 90L, "d3" -> 400L))
    val byDom = out.groupBy(_.getString(1))
    // the smallest domain's rate caps at 1: all rows kept, weight 1.0
    assert(byDom("d1").length === 10)
    assert(byDom("d1").forall(_.getDouble(2) === 1.0))
    // keep-rate is monotone DECREASING in domain size (the α<1 point)
    val rate = byDom.map { case (k, rows) =>
      k -> rows.length.toDouble / inSize(k) }
    assert(rate("d1") > rate("d2") && rate("d2") > rate("d3"),
      s"rates not monotone: $rate")
    // kept rows carry 1/rate: per-domain weight mass ≈ original size
    Seq("d2", "d3").foreach { k =>
      val mass = byDom(k).map(_.getDouble(2)).sum
      assert(math.abs(mass - inSize(k)) / inSize(k) < 0.35,
        s"$k weighted mass $mass vs ${inSize(k)}")
    }
  }

  test("DSIR importance weights rank target-language docs above the " +
      "rest on average (length-normalized)") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.qDsirWeights(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
    // per-feature average log-ratio: positive means the doc's features
    // look more like the target model than the raw-corpus model
    val byTarget = out
      .groupBy((col("lang") === "en").as("is_target"))
      .agg(avg(col("dsir_lw") / col("n_feats")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTarget(true) > byTarget(false),
      s"target ${byTarget(true)} vs rest ${byTarget(false)}")
    assert(byTarget(true) > 0 && byTarget(false) < 0, byTarget.toString)
  }

  test("weighted A-Res sample over-represents long documents and runs " +
      "as TakeOrdered, never a global sort") {
    val sf = "/root/testdata/sf0.001"
    val df = Curation.qSampleWeighted(spark, sf)
    val sampleAvg = df.agg(avg("n_chars")).head().getDouble(0)
    val corpusAvg = Tables.documents(spark, sf)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleAvg > corpusAvg * 1.1,
      s"sample avg $sampleAvg vs corpus $corpusAvg")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("rangepartitioning"), p.take(800))
  }
}
