package graft

import graft.streaming.EventsStreaming

/** State-store backend swap: the 8 declared streaming queries run on
  * Spark's default HDFS-backed in-memory state store; a 100 TB streaming
  * deployment runs RocksDB (state no longer bounded by executor heap,
  * incremental checkpointing). The swap must be pure configuration — no
  * result change — so this spec reruns the stateful streaming shapes
  * (tumbling agg, merging session windows, flatMapGroupsWithState, and
  * the two-stream interval join) under
  * RocksDBStateStoreProvider and asserts row-identical output against
  * the default-provider runs of the same declared queries. */
class RocksDbStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("streaming results are identical under the RocksDB state store") {
    // default-provider runs first (the provider is bound at query start)
    val defTumbling = rows(EventsStreaming.qStreamTumbling(spark, sf))
    val defSessions = rows(EventsStreaming.qStreamSessions(spark, sf))
    val defProfiles = rows(EventsStreaming.qStreamUserProfiles(spark, sf))
    val defJoin = rows(EventsStreaming.qStreamJoin(spark, sf))
    // dropDuplicatesWithinWatermark keeps per-key expiry state — the
    // round-8 streaming-dedup shape rides the same provider swap
    val defDedup = rows(EventsStreaming.qStreamDedup(spark, sf))
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, rocksdb)
      assert(rows(EventsStreaming.qStreamTumbling(spark, sf))
        === defTumbling)
      assert(rows(EventsStreaming.qStreamSessions(spark, sf))
        === defSessions)
      assert(rows(EventsStreaming.qStreamUserProfiles(spark, sf))
        === defProfiles)
      assert(rows(EventsStreaming.qStreamJoin(spark, sf)) === defJoin)
      assert(rows(EventsStreaming.qStreamDedup(spark, sf)) === defDedup)
      assert(defTumbling.nonEmpty && defSessions.nonEmpty &&
        defProfiles.nonEmpty && defJoin.nonEmpty && defDedup.nonEmpty)
    } finally spark.conf.set(key, prev)
  }
}
