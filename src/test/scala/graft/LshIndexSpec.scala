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
    // Plan shape asserted with AQE off (AdaptiveSparkPlanExec hides its
    // children pre-execution) AND auto-broadcast off: at fixture scale
    // Spark would broadcast the tiny probe side, hiding the shape that
    // matters at corpus scale. With shuffle joins forced, BOTH index
    // tables (routing + payload) must scan bucketed, and no shuffle may
    // sit anywhere above either index scan — only probe-side subtrees
    // get exchanged.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.nearDupAgainstLshIndex(spark, "lsh_idx_spec", probe)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def isIndexScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p match {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.startsWith("lsh_idx_spec"))
          case _ => false
        }
      val idxScans = plan.collect {
        case f: FileSourceScanExec if isIndexScan(f) => f
      }
      assert(idxScans.length === 2, plan.toString.take(1500))
      assert(idxScans.forall(_.bucketedScan), plan.toString.take(1500))
      // No exchange may move RAW index data: an index scan reachable from
      // a shuffle without crossing a join means the index table itself is
      // being repartitioned (what the bucketed layout exists to prevent).
      // Data that already passed a join is candidate-sized and may move.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def unjoinedIndexScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isIndexScan(f)
        case _: BaseJoinExec => false
        case other => other.children.exists(unjoinedIndexScan)
      }
      val shufflesOverIndex = plan.collect {
        case e: ShuffleExchangeExec
            if e.children.exists(unjoinedIndexScan) => e
      }
      assert(shufflesOverIndex.isEmpty,
        s"raw index data must not shuffle:\n${plan.toString.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    val gate = Dedup.nearDupAgainstLshIndex(spark, "lsh_idx_spec", probe)
    val twins = gate.filter(col("doc_id") === col("idx_id") + 1000000L)
    assert(twins.count() === docs.count())
    assert(twins.filter(col("jac") =!= 1.0).count() === 0)
  }

  test("incremental append equals a full rebuild (probe-identical)") {
    // Index half the corpus, append the other half, and require the gate
    // results to match an index built over the whole corpus in one shot.
    // Banding is deterministic per doc, so this is exact row equality, not
    // a statistical claim.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val median = 250L
    Dedup.writeLshIndex(docs.filter(col("doc_id") < median),
      "lsh_idx_inc", buckets = 16)
    Dedup.appendToLshIndex(spark, "lsh_idx_inc",
      docs.filter(col("doc_id") >= median))
    Dedup.writeLshIndex(docs, "lsh_idx_full", buckets = 16)
    val probe = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    def rows(t: String): Set[(Long, Long, Double)] =
      Dedup.nearDupAgainstLshIndex(spark, t, probe).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = rows("lsh_idx_inc")
    assert(inc === rows("lsh_idx_full"))
    assert(inc.size >= docs.count()) // every doc finds at least its twin
    // the appended files must land in the SAME bucket spec — the gate join
    // still scans the index side bucketed and exchange-free
    val plan = Dedup.nearDupAgainstLshIndex(spark, "lsh_idx_inc", probe)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
  }

  test("append to a non-bucketed table is refused") {
    import spark.implicits._
    // the warehouse dir outlives the in-memory catalog across JVM runs —
    // clear both (same dance as ScalePatterns.writeBucketed)
    spark.sql("DROP TABLE IF EXISTS lsh_not_bucketed")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath
      else wh
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(whPath, "lsh_not_bucketed"))
    Seq((1L, "plain")).toDF("doc_id", "text")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("lsh_not_bucketed")
    intercept[IllegalArgumentException] {
      Dedup.appendToLshIndex(spark, "lsh_not_bucketed",
        Seq((2L, "more words here")).toDF("doc_id", "text"))
    }
  }
}
