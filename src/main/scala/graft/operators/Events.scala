package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Windowed aggregations over the `events` table (SURVEY.md §2.9).
  * The reference has no streaming at all; these are the north-star
  * extension, built batch-first so they have DuckDB oracles. The same
  * aggregation builders are reused by graft.streaming.EventsStreaming
  * under `readStream` + watermark — identical logical plan, which is the
  * point of Structured Streaming.
  *
  * Scale notes: tumbling/sliding windows are a single hash aggregate on
  * (event_type, window) — partial aggregation map-side, then one shuffle.
  * The sliding window multiplies rows ×4 (1h window / 15m slide) before
  * the partial agg; Spark's `window()` generates the window array and
  * explodes it inside the same stage, so no extra shuffle.
  */
object Events {

  /** Shared tumbling aggregation, applied to a batch or streaming DF. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("cnt"), col("sum_value"))

  /** Shared sliding aggregation (1 hour window, 15 minute slide). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("cnt"), col("sum_value"))

  val qEventsTumbling: (SparkSession, String) => DataFrame = (s, d) =>
    tumblingAgg(Tables.events(s, d)).orderBy("event_type", "win_start")

  val qEventsSliding: (SparkSession, String) => DataFrame = (s, d) =>
    slidingAgg(Tables.events(s, d)).orderBy("event_type", "win_start")

  // Extension: extract a typed field out of the JSON-ish `props` string.
  // regexp_extract (not get_json_object) so the DuckDB oracle uses the
  // same regex semantics.
  val qEventsExtractProps: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k"))
      .orderBy("event_id")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_events_tumbling", qEventsTumbling, Some(
      "SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events GROUP BY event_type, win_start ORDER BY event_type, win_start")),
    QueryDef("q_events_sliding", qEventsSliding, Some(
      "SELECT event_type, strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * (INTERVAL 15 MINUTE), '%Y-%m-%d %H:%M:%S') AS win_start, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS k) ks GROUP BY event_type, win_start ORDER BY event_type, win_start")),
    QueryDef("q_events_extract_props", qEventsExtractProps, Some(
      "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k FROM events ORDER BY event_id"))
  )
}
