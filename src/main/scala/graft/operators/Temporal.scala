package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Time-relational compositions: the band (interval) join and the
  * SCD Type-2 dimension build. Both are shapes time-series / warehouse
  * engines ship natively and Spark does not — re-expressed here with the
  * scale-safe plan declared up front (bucketed prefilter for the band
  * join, a single folded Window for the history build), completing the
  * as-of family in Events.scala.
  */
object Temporal {

  /** Band (interval) self-join — pairs of events from the SAME user whose
    * timestamps lie within `bandSec` seconds of each other. Spark has no
    * native range-join operator, so the scale-safe composition is
    * bucketed prefilter + refine: quantize ts into band-width buckets,
    * explode ONE side to its bucket and both neighbors (×3 rows — the
    * bounded price of turning the inequality into an equi-join), join on
    * (user_id, bucket) as a plain hash shuffle, then refine with the
    * exact band predicate. Any pair within the band differs by at most
    * one bucket, and each pair meets exactly once (the exploded values
    * are distinct) — so no cartesian, no nested-loop, no AQE rescue
    * needed. Orientation fixes on event_id order (not ts order), so
    * equal timestamps are unambiguous.
    *
    * Seconds are compared truncated (unix_timestamp ≡ DuckDB
    * date_diff('second')), which keeps both engines' predicates
    * bit-identical on TIMESTAMP(NANOS) inputs.
    */
  def bandJoinPairs(events: DataFrame, bandSec: Long): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("ts"),
      floor(unix_timestamp(col("ts")) / bandSec).as("bkt"))
    val left = e.select(col("user_id"), col("event_id").as("e1"),
      col("ts").as("ts1"), col("bkt"))
    val right = e.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("ts").as("ts2"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt2"))
    left.join(right,
        left("user_id") === right("u2") && col("bkt") === col("bkt2"))
      .withColumn("delta_s",
        unix_timestamp(col("ts2")) - unix_timestamp(col("ts1")))
      .filter(col("e1") < col("e2") && abs(col("delta_s")) <= bandSec)
      .select(col("user_id"), col("e1"), col("e2"), col("delta_s"))
  }

  val qJoinBand: (SparkSession, String) => DataFrame = (s, d) =>
    bandJoinPairs(Tables.events(s, d), 300L)
      .orderBy("user_id", "e1", "e2")

  /** General interval-OVERLAP join — two tables of arbitrary-length
    * [start, end] intervals (integer day indexes here), all pairs that
    * overlap: `l0 <= r1 AND r0 <= l1`. The band join above handles the
    * keyed within-δ case; this is the unkeyed range-join shape
    * (sessions × promo windows, readings × maintenance outages) that
    * native range-join engines ship and Spark would otherwise plan as a
    * broadcast-nested-loop over the inequality.
    *
    * Scale-safe composition: quantize the day line into width-`bucketW`
    * buckets and explode EACH side into the buckets its interval covers
    * (⌈span/W⌉+1 rows — bounded by interval length, never by the other
    * table), join on bucket equality as a plain hash shuffle, refine
    * with the exact predicate. De-dup is free, not a `distinct`: a
    * qualifying pair's overlap starts at g = greatest(l0, r0), which
    * lies in both intervals, so the pair co-occurs in bucket ⌊g/W⌋ —
    * and ONLY that bucket is allowed to emit it. Exactly-once by
    * construction, no post-join shuffle.
    *
    * At 100 TB: shuffle volume is (rows × avg-buckets-per-interval),
    * tuned by W against the interval-length distribution; partition
    * count scales with the covered time span, so a dense span pairs W
    * with a salt on one side the way the skew-join keys do. No
    * cartesian, no nested loop — the spec locks the plan. */
  def intervalOverlapPairs(left: DataFrame, l0: String, l1: String,
      right: DataFrame, r0: String, r1: String, bucketW: Int): DataFrame = {
    def bkt(c: Column): Column = floor(c / lit(bucketW)).cast("long")
    val lb = left.withColumn("__bkt",
      explode(sequence(bkt(col(l0)), bkt(col(l1)))))
    val rb = right.withColumn("__bkt2",
      explode(sequence(bkt(col(r0)), bkt(col(r1)))))
    lb.join(rb, col("__bkt") === col("__bkt2") &&
        col(l0) <= col(r1) && col(r0) <= col(l1) &&
        col("__bkt") === bkt(greatest(col(l0), col(r0))))
      .drop("__bkt", "__bkt2")
  }

  /** Declared key: 1996 order-processing intervals (orderdate + up to 6
    * days) against supplier service windows (1–14 days spread over
    * 1996), aggregated per window. Day indexes are exact integer
    * date_diffs from 1990-01-01 in both engines; the oracle states the
    * plain inequality join. */
  val qJoinInterval: (SparkSession, String) => DataFrame = (s, d) => {
    val epoch = lit("1990-01-01").cast("date")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select(col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate").cast("date"), epoch).as("a0"))
      .withColumn("a1", col("a0") + pmod(col("o_orderkey"), lit(7)))
    val w = Tables.supplier(s, d)
      .select(col("s_suppkey"),
        (datediff(lit("1996-01-01").cast("date"), epoch) +
          pmod(col("s_suppkey") * 3, lit(350))).as("b0"))
      .withColumn("b1", col("b0") + lit(1) + pmod(col("s_suppkey"), lit(14)))
    intervalOverlapPairs(o, "a0", "a1", w, "b0", "b1", 16)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("s_suppkey")
  }

  /** SCD Type-2 build — turn the per-customer order stream into a
    * versioned dimension history (the warehouse-maintenance staple):
    * version k = the k-th order, valid_from = its date, valid_to_excl =
    * the next version's date (exclusive-end convention; '9999-12-31'
    * sentinel marks the current row). row_number and lead share the same
    * (partition, order) spec so Catalyst folds them into ONE Window
    * node: the whole history build is one hash exchange + one sort at
    * any scale, and appending a day's orders is the same plan over the
    * union (only touched customers re-window under AQE). Ties on order
    * date break by o_orderkey, so the version chain is total and both
    * engines agree.
    */
  val qScd2: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("version", row_number().over(w))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"), col("o_orderkey"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("next_date"), "yyyy-MM-dd"),
          lit("9999-12-31")).as("valid_to_excl"),
        col("next_date").isNull.cast("int").as("is_current"))
      .orderBy("o_custkey", "version")
  }

  /** Calendar gap-fill + forward fill — the time-series densification
    * staple (metrics dashboards, feature stores, retention models): the
    * sparse per-user daily purchase series becomes a DENSE (user × day)
    * grid over the corpus' date span, missing days carry n_events = 0
    * and inherit the most recent observed value (last-observation-
    * carried-forward; days before a user's first purchase stay null).
    *
    * Scale shape: the calendar derives from a 1-row min/max aggregate
    * whose `sequence` explode yields only span-many day rows —
    * broadcast against the distinct-user set, so the grid build is a
    * map-side cross of |users| × |days| with no corpus-sized shuffle.
    * The observed dailies join the grid on (user_id, day) as a plain
    * hash join, and the fill is ONE user-keyed running window — the
    * output is users × days rows by definition (that IS the densified
    * result), each stage key-partitioned. A deployment bounds the span
    * (or fills per-user active ranges) exactly by narrowing the
    * calendar aggregate; the plan shape is unchanged.
    */
  def gapFillForward(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
    val daily = purchases
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("day_value"))
    val cal = events
      .agg(min(col("ts").cast("date")).as("d0"),
        max(col("ts").cast("date")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = purchases.select("user_id").distinct()
      .crossJoin(broadcast(cal))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value").isNull.as("is_gap"),
        col("filled_value"))
      .orderBy("user_id", "day")
  }

  val qGapfillForward: (SparkSession, String) => DataFrame = (s, d) =>
    gapFillForward(Tables.events(s, d))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_gapfill_forward", qGapfillForward, Some(
      "WITH span AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events), cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM span), daily AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), users AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'), grid AS (SELECT u.user_id, c.day FROM users u CROSS JOIN cal c) SELECT g.user_id AS user_id, strftime(g.day, '%Y-%m-%d') AS day, COALESCE(d.n_events, 0) AS n_events, d.day_value IS NULL AS is_gap, last_value(d.day_value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day ORDER BY g.user_id, g.day")),
    QueryDef("q_join_interval", qJoinInterval, Some(
      "WITH o AS (SELECT o_orderkey, o_totalprice, date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS a0, date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) + o_orderkey % 7 AS a1 FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01' AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'), w AS (SELECT s_suppkey, date_diff('day', DATE '1990-01-01', DATE '1996-01-01') + (s_suppkey * 3) % 350 AS b0, date_diff('day', DATE '1990-01-01', DATE '1996-01-01') + (s_suppkey * 3) % 350 + 1 + s_suppkey % 14 AS b1 FROM supplier) SELECT w.s_suppkey, COUNT(*) AS n_overlap, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM w JOIN o ON o.a0 <= w.b1 AND w.b0 <= o.a1 GROUP BY 1 ORDER BY 1")),
    QueryDef("q_join_band", qJoinBand, Some(
      "SELECT a.user_id, a.event_id AS e1, b.event_id AS e2, date_diff('second', a.ts, b.ts) AS delta_s FROM events a JOIN events b ON a.user_id = b.user_id AND a.event_id < b.event_id AND abs(date_diff('second', a.ts, b.ts)) <= 300 ORDER BY a.user_id, e1, e2")),
    QueryDef("q_scd2", qScd2, Some(
      "SELECT o_custkey, CAST(row_number() OVER w AS INT) AS version, o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS valid_from, COALESCE(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'), '9999-12-31') AS valid_to_excl, CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS INT) AS is_current FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_custkey, version"))
  )
}
