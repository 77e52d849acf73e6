package graft

import org.apache.spark.sql.functions._

/** Relational-operator semantics on tiny in-memory frames plus a full
  * registry smoke over the sf0.001 testdata (every declared query must
  * build and execute). */
class OperatorsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry: every oracle key has a query; names are unique") {
    val qNames = Registry.all.map(_.name)
    assert(qNames.distinct.size === qNames.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry smoke: every declared query executes on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("entry returns rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("argmax-per-group picks exactly one row per customer, the latest") {
    val out = operators.Relational.qArgmaxPerGroup(spark, sf)
    val counts = out.groupBy("o_custkey").count()
      .filter(col("count") > 1).count()
    assert(counts === 0)
    // cross-check against max(o_orderdate) per customer
    val orders = Tables.orders(spark, sf)
    val maxd = orders.groupBy("o_custkey")
      .agg(max("o_orderdate").as("md"))
    val joined = out.join(maxd, "o_custkey")
      .filter(date_format(col("md"), "yyyy-MM-dd") =!= col("o_orderdate_s"))
    assert(joined.count() === 0)
  }

  test("update-overlay changes exactly one row per customer") {
    val out = operators.Relational.qUpdateOverlay(spark, sf)
    val changed = out.filter(col("o_orderstatus_new") === "CANCELLED")
      .groupBy("o_custkey").count().filter(col("count") =!= 1)
    assert(changed.count() === 0)
  }

  test("union-append allocates max+1 and appends exactly one row") {
    val orders = Tables.orders(spark, sf)
    val out = operators.Relational.qUnionAppend(spark, sf)
    assert(out.count() === orders.count() + 1)
    val maxId = orders.agg(max("o_orderkey")).head().getLong(0)
    assert(out.filter(col("o_orderstatus") === "NEW").head()
      .getAs[Long]("o_orderkey") === maxId + 1)
  }

  test("case-when boundary: zero price is FREE, not PAID") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 0.01), (3L, 100000.01))
      .toDF("o_orderkey", "o_totalprice")
    val out = df.select(
      when(col("o_totalprice") > 100000d, lit("HIGH"))
        .when(col("o_totalprice") > 0d, lit("PAID"))
        .otherwise(lit("FREE")).as("s")).collect().map(_.getString(0))
    assert(out === Array("FREE", "PAID", "HIGH"))
  }

  test("coalesce chain takes sources in declared order (ref :202-205)") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some("b")), (None, Some("b")), (None, None))
      .toDF("x", "y")
    val out = df.select(coalesce(col("x"), col("y"), lit("z")))
      .collect().map(_.getString(0))
    assert(out === Array("a", "b", "z"))
  }

  test("events table converts nanos to a usable timestamp") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val r = e.agg(min("ts"), max("ts")).head()
    assert(r.getTimestamp(0).before(r.getTimestamp(1)))
  }

  test("sliding window assigns each event to exactly 4 windows") {
    val e = Tables.events(spark, sf)
    val total = e.count()
    val winTotal = operators.Events.slidingAgg(e)
      .agg(sum("cnt")).head().getLong(0)
    assert(winTotal === total * 4)
  }

  test("approx_count_distinct (HLL) lands within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("declared approx-distinct query bounds its own relative error") {
    val rows = operators.Relational2.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Double]("rel_err") < 0.05, r.toString))
  }

  test("chunking covers every token: stride grid, full interiors, tails") {
    val toks = split(trim(col("text")), "\\s+")
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"), size(toks).as("n_tok"))
    val chunks = operators.TextAnalysis.qChunkOverlap(spark, sf)
      .join(counts, "doc_id")
    // a chunk may be short ONLY in the tail region (start > n_tok - 32);
    // with stride 24 < width 32 the tail can hold up to two such chunks
    assert(chunks.filter(col("n_tokens") =!= 32 &&
      col("start_tok") <= col("n_tok") - 32).isEmpty)
    val byDoc = chunks
      .groupBy("doc_id", "n_tok")
      .agg(min("start_tok").as("first_start"),
        max(col("start_tok") + col("n_tokens")).as("cover_end"),
        sum(when(col("start_tok") % 24 =!= 0, 1).otherwise(0)).as("off_grid"))
    assert(byDoc.filter(col("first_start") =!= 0 ||
      col("cover_end") =!= col("n_tok") || col("off_grid") =!= 0).isEmpty)
  }

  test("int8 quantization: MSE bounded by (scale/2)^2, mass bounded") {
    val rows = operators.Similarity.qEmbedQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale_r")
      val mse = r.getAs[Double]("recon_mse")
      val nDims = r.getAs[Int]("n_dims")
      // per-element |err| <= scale/2 ⇒ mse <= (scale/2)^2; scale_r and
      // mse are 6-decimal-rounded outputs, so allow that much slack
      assert(mse <= scale * scale / 4 + 1e-6, r.toString)
      assert(r.getAs[Long]("q_l1") <= 127L * nDims, r.toString)
      assert(scale > 0, r.toString)
    }
  }

  test("band join: bucketed prefilter+refine ≡ direct inequality join") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    // oracle-grade direct form: equi on user, refine both inequalities
    val a = e.select(col("user_id"), col("event_id").as("e1"),
      col("ts").as("ts1"))
    val b = e.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("ts").as("ts2"))
    val direct = a.join(b, col("user_id") === col("u2"))
      .withColumn("delta_s",
        unix_timestamp(col("ts2")) - unix_timestamp(col("ts1")))
      .filter(col("e1") < col("e2") && abs(col("delta_s")) <= 300)
      .select("user_id", "e1", "e2", "delta_s")
    val banded = operators.Temporal.bandJoinPairs(
      Tables.events(spark, sf), 300L)
    assert(banded.count() > 0)
    assert(banded.exceptAll(direct).isEmpty && direct.exceptAll(banded).isEmpty)
  }

  test("scd2: versions contiguous, intervals chain, one current per key") {
    val h = operators.Temporal.qScd2(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("version")
    val chained = h
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_ver", lead(col("version"), 1).over(w))
    // every non-final version: next version is +1 and starts exactly
    // where this one's exclusive end sits
    assert(chained.filter(col("next_ver").isNotNull &&
      (col("next_ver") =!= col("version") + 1 ||
        col("next_from") =!= col("valid_to_excl"))).isEmpty)
    val perKey = h.groupBy("o_custkey")
      .agg(min("version").as("v0"), max("version").as("vn"),
        count(lit(1)).as("n"), sum("is_current").as("n_cur"))
    assert(perKey.filter(col("v0") =!= 1 || col("vn") =!= col("n") ||
      col("n_cur") =!= 1).isEmpty)
  }

  test("gap-fill: dense user×day grid, LOCF carries the last observation") {
    val g = operators.Temporal.qGapfillForward(spark, sf)
    val nUsers = g.select("user_id").distinct().count()
    val nDays = g.select("day").distinct().count()
    assert(g.count() === nUsers * nDays, "grid must be exactly users × days")
    assert(g.filter(col("is_gap")).count() > 0, "fixture must contain gaps")
    // the calendar cross MUST be a broadcast of the tiny day list, never
    // a shuffled cartesian of corpus-sized inputs
    assert(!g.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // independent LOCF re-derivation: walk each user's days in order and
    // check every gap row carries exactly the last observed value (null
    // before the first observation) and zero events
    g.collect().groupBy(_.getAs[Long]("user_id")).values.foreach { rs0 =>
      val rs = rs0.sortBy(_.getAs[String]("day"))
      var lastSeen: Option[Double] = None
      rs.foreach { r =>
        val fv = Option(r.getAs[java.lang.Double]("filled_value"))
          .map(_.doubleValue())
        if (r.getAs[Boolean]("is_gap")) {
          assert(r.getAs[Long]("n_events") === 0L, r.toString)
          assert(fv === lastSeen, r.toString)
        } else {
          assert(r.getAs[Long]("n_events") > 0L, r.toString)
          assert(fv.isDefined, r.toString)
          lastSeen = fv
        }
      }
    }
  }

  test("bpe pairs: vocab-aggregated counts ≡ direct corpus pair counts") {
    val toks = split(trim(col("text")), "\\s+")
    // direct path: explode every token INSTANCE (no vocab pre-agg),
    // then count pairs — must equal the freq-weighted vocab path
    val direct = Tables.documents(spark, sf)
      .select(explode(toks).as("word"))
      .select(concat(regexp_extract_all(col("word"), lit("."), lit(0)),
        array(lit("</w>"))).as("sym"))
      .select(explode(when(size(col("sym")) >= 2,
        transform(sequence(lit(1), size(col("sym")) - 1),
          i => concat_ws(" ", element_at(col("sym"), i),
            element_at(col("sym"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("direct_cnt"))
    val top = operators.TextAnalysis.qBpePairs(spark, sf)
    assert(top.count() === 30)
    assert(top.join(direct, "pair")
      .filter(col("weighted_cnt") =!= col("direct_cnt")).isEmpty)
    // every pair ends a word or chains two in-word symbols; the marker
    // never starts a pair
    assert(top.filter(col("pair").startsWith("</w>")).isEmpty)
  }

  test("iqr outlier gate: fences keep a sane majority, never invent rows") {
    val rows = operators.Curation.qOutlierIqr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      // Tukey fences at 1.5×IQR always retain the interquartile half
      assert(kept <= total && kept >= total / 2, r.toString)
    }
  }

  test("cooc-pmi: pairs oriented, floored, scores finite") {
    val rows = operators.TextAnalysis.qCoocPmi(spark, sf).collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val Array(a, b) = r.getAs[String]("pair").split(" ", 2)
      assert(a <= b, r.toString)
      assert(r.getAs[Long]("c_ab") >= 5, r.toString)
      assert(!r.getAs[Double]("pmi").isNaN &&
        !r.getAs[Double]("pmi").isInfinite, r.toString)
    }
  }

  test("inverted index: postings sorted, truncated at 20, df floor holds") {
    val rows = operators.TextAnalysis.qInvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val posts = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(df >= 20, r.toString)
      assert(posts.length === math.min(df, 20L).toInt, r.toString)
      assert(posts.sameElements(posts.sorted), r.toString)
    }
  }

  test("equi-depth bins: all deciles present, depths balanced, ranges " +
      "ordered") {
    val rows = operators.Curation.qEquidepthBins(spark, sf)
      .collect().sortBy(_.getAs[Int]("bin"))
    assert(rows.map(_.getAs[Int]("bin")).sameElements(0 to 9))
    val total = rows.map(_.getAs[Long]("cnt")).sum
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      // equi-depth: every decile within ±3% of the ideal tenth
      assert(math.abs(cnt - total / 10.0) <= total * 0.03, r.toString)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"), s"$a | $b")
    }
  }

  test("rolling DAU: fan-out form ≡ direct trailing-window join, and " +
      "bounded by plain DAU") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val direct = ud.select(col("day").as("rday")).distinct()
      .join(ud, col("day").between(col("rday") - 6, col("rday")))
      .groupBy("rday").agg(countDistinct("user_id").as("dau7_direct"))
      .select(date_format(col("rday"), "yyyy-MM-dd").as("day"),
        col("dau7_direct"))
    val plain = ud.groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("dau1"))
    val rolled = operators.Events.qRollingDau(spark, sf)
    assert(rolled.join(direct, "day")
      .filter(col("dau7") =!= col("dau7_direct")).isEmpty)
    assert(rolled.join(plain, "day")
      .filter(col("dau7") < col("dau1")).isEmpty)
  }

  test("event transitions: rows sum to their from-state mass, chain " +
      "count conserved") {
    val t = operators.Events.qEventTransitions(spark, sf)
    val byFrom = t.groupBy("from_type")
      .agg(sum("prob").as("p"), sum("cnt").as("n"))
    // rounding to 6 decimals leaves the row-sum within 1e-4 of 1
    assert(byFrom.filter(abs(col("p") - 1.0) > 1e-4).isEmpty)
    val totalTransitions = t.agg(sum("cnt")).head.getLong(0)
    val expected = Tables.events(spark, sf).groupBy("user_id")
      .agg((count(lit(1)) - 1).as("m"))
      .agg(sum("m")).head.getLong(0)
    assert(totalTransitions === expected)
  }

  test("dedup report: doc mass conserved, removable = docs - clusters") {
    val rows = operators.Dedup.qDedupReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("csize") * r.getAs[Long]("n_clusters"), r.toString)
      assert(r.getAs[Long]("n_removable") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"), r.toString)
    }
  }

  test("count-min heavy hitters: estimates are one-sided and bounded") {
    val rows = operators.TextAnalysis.qApproxTopk(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val over = r.getAs[Long]("overestimate")
      assert(over >= 0, s"count-min must never underestimate: $r")
      assert(over <= r.getAs[Long]("err_bound"), r.toString)
    }
    // heavy hitters must actually be heavy: top-1 exact count sanity
    assert(rows.head.getAs[Long]("exact_cnt") > 100)
  }

  test("approx-percentile sketch honors its rank-error contract") {
    // percentile_approx(accuracy=1000) must return an actual data value
    // whose RANK is within n/1000 of the true median rank — check against
    // the data itself, not just the value delta (the contract is on rank).
    val rows = operators.Relational2.qApproxPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
    rows.foreach { r =>
      val status = r.getAs[String]("o_orderstatus")
      val n = r.getAs[Long]("n")
      val approx = r.getAs[Double]("p50_approx")
      val below = orders
        .filter(col("o_orderstatus") === status &&
          col("o_totalprice") <= approx).count()
      val bound = n / 1000.0 + 1
      assert(math.abs(below - n / 2.0) <= bound + 1,
        s"$status: rank ${below} vs target ${n / 2.0} (bound $bound)")
    }
  }

  test("unpivot melts the pivot-shaped wide aggregate losslessly") {
    val long = operators.Relational2.qUnpivot(spark, sf)
    // 3 metrics per group, and re-widening recovers the original values
    val perGroup = long.groupBy("o_orderpriority").count()
      .filter(col("count") =!= 3).count()
    assert(perGroup === 0)
    val wide = Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("v"))
    val melted = long.filter(col("metric") === "n_orders")
      .join(wide, "o_orderpriority")
      .filter(col("value") =!= col("v"))
    assert(melted.count() === 0)
  }

  test("decay score: today's purchase counts full, old ones halve weekly") {
    import spark.implicits._
    import graft.Tables
    // synthetic: one user, 100.00 at ref day, 100.00 at 7 days before,
    // 100.00 at 70 days before (capped at k=6) ->
    // 100·2^0 + 100·2^-1 + 100·2^-6 = 151.5625 -> 151_562_500 fp
    val dir = java.nio.file.Files.createTempDirectory("graft_decay").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2025-03-12 10:00:00"), 1L,
        "purchase", 100.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2025-03-05 10:00:00"), 1L,
        "purchase", 100.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), 1L,
        "purchase", 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Events.qDecayScore(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("score_fp") === 151562500L)
    assert(out.head.getAs[Long]("n_purchases") === 3L)
  }

  test("multimodal feature extraction is deterministic over payload bytes") {
    val f1 = operators.Multimodal.qMultimodalFeatures(spark, sf).collect()
    val f2 = operators.Multimodal.qMultimodalFeatures(spark, sf).collect()
    assert(f1.sameElements(f2))
    f1.take(10).foreach { r =>
      assert(r.getAs[Long]("n_pixels") ===
        r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
    }
  }
}
