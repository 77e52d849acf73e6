package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: production invariants (row counts, null
  * counts, value bounds) collected DURING the job via `observe()` —
  * no second pass over the data. At 100 TB a separate validation scan
  * doubles the bill; the observe node rides the existing plan and its
  * metrics arrive with the action's completion. */
class ObservabilitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("observe() yields input invariants from the same pass as the job") {
    val obs = Observation("ingest")
    val docs = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count(col("text")).as("nonnull_text"),
        max(col("n_chars")).as("max_chars"))
      .filter(col("lang") === "en")
    // the ACTION only touches the filtered subset...
    val enRows = docs.count()
    // ...but the metrics describe the full input that flowed past the
    // observe node — the invariant check costs no extra scan.
    val m = obs.get
    val total = Tables.documents(spark, sf).count()
    assert(m("rows_in") === total)
    assert(m("nonnull_text") === total)
    assert(enRows < total, "filter must actually reduce the stream")
    assert(m("max_chars").asInstanceOf[Long] > 0L)
  }

  test("observe() on a curation stage reports the gate's reject rate") {
    val obs = Observation("gate")
    val scored = operators.TextAnalysis.qQualityScore(spark, sf)
    val gated = scored
      .observe(obs,
        count(lit(1)).as("candidates"),
        sum(when(col("quality") >= 0.5, 1L).otherwise(0L))
          .as("passing"))
      .filter(col("quality") >= 0.5)
    val kept = gated.count()
    val m = obs.get
    assert(m("candidates").asInstanceOf[Long] === scored.count())
    assert(m("passing").asInstanceOf[Long] === kept)
  }
}
