package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming

/** Structured Streaming ≡ batch: the same aggregation builders must
  * produce identical results when fed the events table as a stream
  * (file source, one file per trigger) and as a batch frame. */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def runStream(name: String,
      plan: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String): org.apache.spark.sql.DataFrame = {
    // stage the events as a parquet directory for the streaming source
    val dir = Files.createTempDirectory(s"graft_stream_$name").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = EventsStreaming.readEventsStream(spark, dir)
    assert(stream.isStreaming)
    val q = plan(stream).writeStream
      .format("memory")
      .queryName(s"sink_$name")
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(s"sink_$name")
  }

  test("streaming tumbling aggregation matches batch (complete mode)") {
    val streamed = runStream("tumble", EventsStreaming.tumbling, "complete")
      .orderBy("event_type", "win_start").collect()
    val batch = operators.Events.qEventsTumbling(spark, sf).collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
  }

  test("streaming dedup emits each event once") {
    val streamed = runStream("dedup", EventsStreaming.dedup, "append")
    assert(streamed.count() === Tables.events(spark, sf).count())
    assert(streamed.select("event_id").distinct().count() ===
      streamed.count())
  }

  test("streaming sessionization produces bounded per-user sessions") {
    val streamed = runStream("sess", EventsStreaming.sessions, "complete")
    assert(streamed.count() > 0)
    // session counts must sum to the event count
    assert(streamed.agg(sum("cnt")).head().getLong(0) ===
      Tables.events(spark, sf).count())
  }
}
