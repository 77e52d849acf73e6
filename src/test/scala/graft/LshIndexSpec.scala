package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The persisted LSH index: bucketed layout, exchange-free index side at
  * gate-join time, and twin recovery — the batch counterpart of the
  * streaming ingest gate. */
class LshIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gate join leaves the bucketed index side exchange-free and finds twins") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.writeLshIndex(docs, "lsh_idx_spec", buckets = 16)
    // probe = exact copies with shifted ids → every doc must find its twin
    val probe = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val gate = Dedup.nearDupAgainstLshIndex(spark, "lsh_idx_spec", probe)
    val plan = gate.queryExecution.executedPlan.toString
    // the persisted side scans as a bucketed FileScan; its subtree must
    // contain no shuffle (only the probe side gets exchanged)
    val exchanges = plan.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange hashpartitioning") ||
        l.trim.startsWith(":- Exchange hashpartitioning"))
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    assert(exchanges <= 1, s"expected only the probe side to shuffle:\n" +
      plan.take(1500))
    val twins = gate.filter(col("doc_id") === col("idx_id") + 1000000L)
    assert(twins.count() === docs.count())
    assert(twins.filter(col("jac") =!= 1.0).count() === 0)
  }
}
