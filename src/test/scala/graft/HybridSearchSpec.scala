package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** RRF fusion semantics for q_hybrid_search: both-list members outrank
  * single-list members at comparable ranks, every contribution is
  * 1/(60+rank), and the output is a valid per-query top-10. */
class HybridSearchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    TextAnalysis.qHybridSearch(spark, sf).collect()

  test("shape: 8 queries × ≤10 rows, rank is a 1-based dense prefix") {
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (1L to 8L).toSet)
    for ((_, rs) <- byQ) {
      assert(rs.length <= 10)
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length))
    }
  }

  test("rrf is exactly the sum of the legs' reciprocal ranks") {
    for (r <- rows) {
      val t = if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4))
      val v = if (r.isNullAt(5)) 0.0 else 1.0 / (60 + r.getInt(5))
      assert(r.getDouble(3) ===
        BigDecimal(t + v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, r.toString)
      assert(!(r.isNullAt(4) && r.isNullAt(5)),
        "a fused row must come from at least one leg")
    }
  }

  test("a doc in BOTH legs outranks docs a single leg ranked higher") {
    // 1/(60+t) + 1/(60+v) with t,v ≤ 10 strictly exceeds 1/61 (the
    // best any single-leg doc can score), so every both-leg doc must
    // sort above every single-leg doc within its query.
    val byQ = rows.groupBy(_.getLong(0))
    for ((q, rs) <- byQ) {
      val ranks = rs.sortBy(_.getInt(1))
      val both = ranks.zipWithIndex.collect {
        case (r, i) if !r.isNullAt(4) && !r.isNullAt(5) => i
      }
      val single = ranks.zipWithIndex.collect {
        case (r, i) if r.isNullAt(4) || r.isNullAt(5) => i
      }
      if (both.nonEmpty && single.nonEmpty)
        assert(both.max < single.min,
          s"query $q: both-leg docs must lead the fused ranking")
    }
  }

  test("index-served hybrid ≡ in-flight hybrid, row for row") {
    // Both legs swap to their persisted artifacts (bkt-pruned postings
    // probe; one-pass batch IVF probe-all) — the fusion must not see
    // the difference. This row-identity is why q_hybrid_search_indexed
    // shares q_hybrid_search's oracle BY REFERENCE.
    val indexed = TextAnalysis.qHybridSearchIndexed(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(indexed === rows.map(_.toSeq).toSeq)
  }

  test("pruned serving config: per-query recall vs the exhaustive " +
      "twin clears the 0.4 floor and is structurally sound") {
    // The deployed nprobe=3 config can lose vector-leg candidates the
    // probe-all twin finds — recall is an index property, so the key is
    // rows-only — but a healthy index at this corpus keeps the fused
    // overlap far above the vector leg's 0.4 declared floor. A
    // collapsed index would read as recall→0 here and in the driver
    // dump.
    val rec = TextAnalysis.qHybridSearchPrunedRecall(spark, sf)
      .collect()
    assert(rec.length === 8)
    rec.foreach { r =>
      assert(r.getAs[Long]("truth_k") === 10L, r.toString)
      assert(r.getAs[Double]("recall") >= 0.4, r.toString)
    }
  }
}
