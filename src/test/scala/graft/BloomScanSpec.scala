package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Parquet bloom-filter point lookups actually skip row groups: the
  * same hash-scattered layout is staged with and without the key bloom;
  * the bloom scan must surface ~one row group's rows for a point
  * predicate while the control reads ~everything (min/max zone maps
  * can't prune a scattered key). Results must be identical. */
class BloomScanSpec extends SparkSpec {

  test("point lookup on a bloom-indexed layout reads ~1 row group; " +
      "the same layout without blooms reads ~all of them") {
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft_bloom").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "user_id", "event_type", "value")
    Sources.writeBloomIndexed(ev, s"$dir0/bloom", "event_id", 16)
    Sources.writeBloomIndexed(ev, s"$dir0/plain", "event_id", 16,
      withBloom = false)
    val total = ev.count()
    val key = ev.agg(min("event_id")).head().getLong(0) + total / 2

    def rowsRead(dir: String): (Long, Seq[Long]) = {
      val df = spark.read.parquet(dir).filter(col("event_id") === key)
      val found = df.collect().map(_.getAs[Long]("event_id")).toSeq
      val scanned = collectFileScans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      (scanned, found)
    }

    val (bloomRead, bloomRows) = rowsRead(s"$dir0/bloom")
    val (plainRead, plainRows) = rowsRead(s"$dir0/plain")
    // identical results — blooms have no false negatives
    assert(bloomRows === plainRows)
    assert(bloomRows === Seq(key))
    // the control cannot prune: scattered key => useless min/max stats
    assert(plainRead > total * 9 / 10,
      s"control read $plainRead of $total — zone maps unexpectedly pruned")
    // the bloom scan skips row groups that definitely lack the key
    assert(bloomRead <= total / 4,
      s"bloom scan read $bloomRead of $total — bloom filter did not prune")
  }
}
