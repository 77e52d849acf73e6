package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Events

/** Structured Streaming variants of the events pipeline (SURVEY.md §2.9,
  * phase 4): the SAME aggregation builders as the batch queries
  * (graft.operators.Events), applied to an unbounded source with
  * watermarks — which is the point of Structured Streaming's unified
  * model: one logical plan, batch or stream.
  *
  * The reference has no streaming semantics to match (schedule=None,
  * dags/subscription_flow.py:40), so late-data policy follows Spark
  * defaults with an explicit watermark.
  *
  * Scale notes: stateful aggs shuffle on the grouping key; the watermark
  * bounds state. dropDuplicates keys state by event_id with the same
  * watermark bound. Session windows use the built-in session_window
  * (merging state per user) — at 100 TB you would also cap session gap
  * and shard hot users.
  */
object EventsStreaming {

  /** events schema as produced by Tables.events after the nanos→micros
    * conversion (streaming file sources need an explicit schema). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read over a directory of parquet event files. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Tumbling 1h aggregation with a 10-minute watermark — identical logic
    * to the batch q_events_tumbling. */
  def tumbling(events: DataFrame): DataFrame =
    Events.tumblingAgg(events.withWatermark("ts", "10 minutes"))

  /** Sliding 1h/15m aggregation with a 10-minute watermark. */
  def sliding(events: DataFrame): DataFrame =
    Events.slidingAgg(events.withWatermark("ts", "10 minutes"))

  /** Streaming exact dedup by event_id, state bounded by the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")

  /** Per-user session windows (30-minute gap): count + value sum. */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_start"),
        col("cnt"), col("sum_value"))
}
