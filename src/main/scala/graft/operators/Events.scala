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

  /** Shared per-user sessionization (30-minute gap): the batch form of
    * streaming session windows. Session start = first event's timestamp.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_start"),
        col("cnt"), col("sum_value"))

  val qEventsTumbling: (SparkSession, String) => DataFrame = (s, d) =>
    tumblingAgg(Tables.events(s, d)).orderBy("event_type", "win_start")

  val qEventsSessions: (SparkSession, String) => DataFrame = (s, d) =>
    sessionAgg(Tables.events(s, d)).orderBy("user_id", "sess_start")

  // As-of join composed from built-ins (SURVEY §2.3 preference order (a)):
  // for each purchase, the user's most recent click at-or-before it.
  // Union-tag both sides, one window pass per user ordered by time
  // (clicks sort before purchases at equal ts to honor the inclusive
  // bound), carry the last non-null click id forward. One shuffle on
  // user_id — the same cost profile as a native as-of operator; DuckDB's
  // built-in ASOF JOIN is the oracle.
  val qAsofJoin: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        lit(0).as("is_p"), lit(null).cast("long").as("purchase_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("click_id"), lit(1).as("is_p"),
        col("event_id").as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_p").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("prior_click", last(col("click_id"), ignoreNulls = true)
        .over(w))
      .filter(col("purchase_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("prior_click"))
      .orderBy("purchase_id")
  }

  // FORWARD as-of: for each purchase, the user's EARLIEST click at-or-
  // after it — the other direction time-series engines pair with the
  // backward as-of above ("what did the user do next"). Same union-tag
  // single-window shape (one shuffle on user_id); at equal ts the click
  // sorts after the purchase so the inclusive forward frame sees it.
  val qAsofForward: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        lit(0).as("is_p"), lit(null).cast("long").as("purchase_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("click_id"), lit(1).as("is_p"),
        col("event_id").as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_p").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("next_click", first(col("click_id"), ignoreNulls = true)
        .over(w))
      .filter(col("purchase_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("next_click"))
      .orderBy("purchase_id")
  }

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

  // VariantType surface (Spark 4): the schema-less semi-structured path —
  // parse_json binary-encodes the document once, variant_get extracts a
  // typed field lazily without a declared schema. At 100 TB this is the
  // ingest shape for heterogenous event payloads: no schema inference
  // pass, shredding/pushdown improves as the format matures, and a field
  // added upstream never breaks the reader. Oracle is DuckDB's JSON
  // extraction of the same field.
  val qVariantExtract: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.events(s, d)
      .selectExpr("event_type",
        "variant_get(parse_json(props), '$.k', 'bigint') AS k_val")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k_val")).as("sum_k"))
      .orderBy("event_type")

  // MapType surface (SURVEY §1.3's "from_json → MapType" extension row):
  // parse the props JSON into a map, extract + count keys. The map stays a
  // plan-internal type; outputs are scalars so the oracle hash is stable.
  val qPropsMap: (SparkSession, String) => DataFrame = (s, d) => {
    import org.apache.spark.sql.types.{MapType, StringType}
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), MapType(StringType, StringType)).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "k").cast("long").as("k"),
        size(col("m")).as("n_keys"))
      .orderBy("event_id")
  }

  /** Weekly cohort retention: users grouped by the Monday-start week of
    * their FIRST event, activity counted as distinct users per
    * (cohort, whole-week offset). The product-analytics staple, shaped
    * for scale: first-touch is a partial-agg'd min per user (one shuffle
    * on user_id), the join back rides the same key (AQE may broadcast
    * the first-touch side when small — a runtime call, not a plan
    * assumption), and the distinct-user count partial-aggregates on
    * (cohort, offset, user) before the final count. */
  val qCohortRetention: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d).select(col("user_id"), col("ts"))
    val first = e.groupBy("user_id").agg(min("ts").as("first_ts"))
    e.join(first, "user_id")
      .select(
        date_format(date_trunc("week", col("first_ts")), "yyyy-MM-dd")
          .as("cohort_week"),
        floor(datediff(to_date(col("ts")), to_date(col("first_ts"))) / 7.0)
          .as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Ordered conversion funnel view → click-after-view →
    * purchase-after-that-click, counted once per user. The stage
    * dependencies are sequential (each stage's min-ts must fall strictly
    * after the previous stage's), so it composes as three per-user min
    * aggregations chained by user_id equi-joins — all on ONE shuffle key,
    * so a cluster run reuses the user_id partitioning across stages
    * instead of re-exchanging. Left joins keep drop-off visible; the
    * final row is the funnel summary. */
  val qFunnel: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vt"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("vt"))
      .groupBy("user_id").agg(min("ts").as("ct"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("ct"))
      .groupBy("user_id").agg(min("ts").as("pt"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(col("vt")).as("n_view"),
        count(col("ct")).as("n_view_click"),
        count(col("pt")).as("n_view_click_purchase"))
  }

  /** Trailing-7-day distinct actives per day (the DAU/WAU reporting
    * staple). The naive form is a per-day inequality join over the raw
    * stream; the scale-safe composition dedups to (user, day) FIRST
    * (one shuffle that collapses the corpus to active-pairs), then
    * fans each pair out to the ≤7 report days it can serve (a Generate
    * inside the stage — never crosses the network), joins the tiny
    * observed-days dim (broadcast by size), and two-phase
    * count-distincts per report day. At 100 TB the fan-out multiplies
    * the DEDUPED pair set, not the event stream — the reason this
    * shape survives where the inequality join does not. */
  val qRollingDau: (SparkSession, String) => DataFrame = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = ud.select(col("day").as("rday")).distinct()
    ud.select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("k"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("k")).as("rday"))
      .join(days, "rday")
      .groupBy("rday")
      .agg(countDistinct("user_id").as("dau7"))
      .select(date_format(col("rday"), "yyyy-MM-dd").as("day"), col("dau7"))
      .orderBy("day")
  }

  /** First-order Markov transition model over per-user event sequences —
    * the sequence-statistics pass session-model and next-event-
    * prediction pipelines run. One user-keyed window (lead) pairs each
    * event with its successor (ties on ts break by event_id, so the
    * chain is total); the transition matrix is then |types|² rows, and
    * the row-normalizing probability window runs over that tiny grouped
    * set, not the corpus. Counts stay exact longs; the probability
    * divides as double in both engines and rounds to 6. */
  val qEventTransitions: (SparkSession, String) => DataFrame = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob", round(col("cnt").cast("double") /
        sum("cnt").over(org.apache.spark.sql.expressions.Window
          .partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** Z-order layout audit — the Morton interleave of (user, hour)
    * aggregated per coarse z-bucket: the declared, oracled proof that
    * any contiguous z range keeps BOTH dimensions bounded (a top-10-bit
    * bucket fixes the top 5 bits of each 16-bit dimension, so each
    * bucket spans ≤2^11 of each), which is exactly what makes per-file
    * min/max zone maps prune scans filtered on EITHER dimension once
    * the table is written in z order. The interleave
    * (ScalePatterns.zValue) is pure codegen'd bit arithmetic; the
    * layout writer and its measured locality assertion live in
    * ScalePatterns.writeZOrdered / ScalePatternsSpec. */
  val qZorderLayout: (SparkSession, String) => DataFrame = (s, d) => {
    val hr = expr("unix_micros(ts) div 3600000000")
    val ev = Tables.events(s, d).select(col("user_id"), hr.as("hr"))
    // normalize each dimension to its observed [min, max] range mapped
    // onto the full 16-bit window (integer floor arithmetic, exact in
    // both engines) — raw values vary only in their LOW bits here, which
    // would leave every row in one coarse bucket; a real clustering job
    // samples ranges the same way before interleaving
    val r = ev.agg(min("user_id").as("umin"), max("user_id").as("umax"),
      min("hr").as("hmin"), max("hr").as("hmax"))
    ev.crossJoin(broadcast(r))
      .withColumn("z", graft.functions.ScalePatterns.zValue(
        expr("(user_id - umin) * 65536 div (umax - umin + 1)"),
        expr("(hr - hmin) * 65536 div (hmax - hmin + 1)")))
      .groupBy(shiftright(col("z"), 22).as("zbucket"))
      .agg(count(lit(1)).as("cnt"),
        min("user_id").as("u_lo"), max("user_id").as("u_hi"),
        min("hr").as("h_lo"), max("hr").as("h_hi"))
      .orderBy("zbucket")
  }

  /** Time-decayed engagement score — the recency-weighted feature the
    * ranking/retention models consume: each purchase contributes
    * value · 2^(−age_weeks), half-life one week, floored at 2^(−6)
    * (~6 weeks horizon). Computed ENTIRELY in exact arithmetic: the
    * weight 2^(−k) = 5^k/10^k is decimal-exact, so the contribution is
    * value(DECIMAL) · 5^k · 10^(6−k) — a BIGINT-scaled decimal whose sum
    * is independent of partition layout and engine, where the float form
    * (value · pow(0.5, age/7.0)) would drift with summation order AND
    * libm. Output is fixed-point: score_fp = floor(Σ) in units of 10⁻⁶.
    *
    * Scale shape: the reference date is a 1-row max aggregate broadcast
    * back (the scalar-gate pattern); scoring is then map-only per event
    * and one partial-agg'd groupBy(user). A daily refresh re-runs in one
    * pass — or incrementally: yesterday's score halves every 7 days, so
    * Σ re-scales by a constant between refreshes and only NEW events
    * need scoring. */
  val qDecayScore: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"), col("ts").cast("date").as("day"))
    val ref = e.agg(max("day").as("ref_day"))
    e.crossJoin(broadcast(ref))
      .withColumn("k", least(floor(datediff(col("ref_day"), col("day"))
        / 7).cast("int"), lit(6)))
      .withColumn("term", col("value").cast("decimal(18,2)") *
        expr("CAST(power(5, k) AS BIGINT) * CAST(power(10, 6 - k) AS BIGINT)"))
      .groupBy("user_id")
      .agg(floor(sum(col("term"))).cast("long").as("score_fp"),
        count(lit(1)).as("n_purchases"))
      .orderBy("user_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_decay_score", qDecayScore, Some(
      "WITH e AS (SELECT user_id, value, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'), r AS (SELECT MAX(day) AS ref_day FROM e), t AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) * CAST(power(5, k) AS BIGINT) * CAST(power(10, 6 - k) AS BIGINT) AS term FROM (SELECT user_id, value, LEAST(date_diff('day', day, ref_day) // 7, 6) AS k FROM e, r)) SELECT user_id, CAST(FLOOR(SUM(term)) AS BIGINT) AS score_fp, COUNT(*) AS n_purchases FROM t GROUP BY user_id ORDER BY user_id")),
    QueryDef("q_zorder_layout", qZorderLayout, Some(
      "WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr FROM events), r AS (SELECT MIN(user_id) AS umin, MAX(user_id) AS umax, MIN(hr) AS hmin, MAX(hr) AS hmax FROM e), t1 AS (SELECT user_id, hr, ((user_id - umin) * 65536 // (umax - umin + 1)) & 65535 AS ua, ((hr - hmin) * 65536 // (hmax - hmin + 1)) & 65535 AS hb FROM e CROSS JOIN r), t2 AS (SELECT user_id, hr, ((ua | (ua << 8)) & 16711935) AS ua, ((hb | (hb << 8)) & 16711935) AS hb FROM t1), t3 AS (SELECT user_id, hr, ((ua | (ua << 4)) & 252645135) AS ua, ((hb | (hb << 4)) & 252645135) AS hb FROM t2), t4 AS (SELECT user_id, hr, ((ua | (ua << 2)) & 858993459) AS ua, ((hb | (hb << 2)) & 858993459) AS hb FROM t3), t5 AS (SELECT user_id, hr, ((ua | (ua << 1)) & 1431655765) AS ua, ((hb | (hb << 1)) & 1431655765) AS hb FROM t4) SELECT (ua | (hb << 1)) >> 22 AS zbucket, COUNT(*) AS cnt, MIN(user_id) AS u_lo, MAX(user_id) AS u_hi, MIN(hr) AS h_lo, MAX(hr) AS h_hi FROM t5 GROUP BY 1 ORDER BY 1")),
    QueryDef("q_rolling_dau", qRollingDau, Some(
      "WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), days AS (SELECT DISTINCT day FROM ud) SELECT strftime(d.day, '%Y-%m-%d') AS day, COUNT(DISTINCT u.user_id) AS dau7 FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day GROUP BY 1 ORDER BY 1")),
    QueryDef("q_event_transitions", qEventTransitions, Some(
      "WITH s AS (SELECT user_id, event_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), c AS (SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS cnt FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2) SELECT from_type, to_type, cnt, round(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY from_type), 6) AS prob FROM c ORDER BY from_type, to_type")),
    QueryDef("q_cohort_retention", qCohortRetention, Some(
      "SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week, CAST(floor(date_diff('day', CAST(first_ts AS DATE), CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week_offset, COUNT(DISTINCT user_id) AS n_users FROM (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM events) GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset")),
    QueryDef("q_funnel", qFunnel, Some(
      "WITH v AS (SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id), c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id), p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id) SELECT COUNT(v.vt) AS n_view, COUNT(c.ct) AS n_view_click, COUNT(p.pt) AS n_view_click_purchase FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id")),
    QueryDef("q_props_map", qPropsMap, Some(
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, CAST(len(json_keys(props)) AS INT) AS n_keys FROM events ORDER BY event_id")),
    QueryDef("q_events_tumbling", qEventsTumbling, Some(
      "SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events GROUP BY event_type, win_start ORDER BY event_type, win_start")),
    QueryDef("q_events_sliding", qEventsSliding, Some(
      "SELECT event_type, strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * (INTERVAL 15 MINUTE), '%Y-%m-%d %H:%M:%S') AS win_start, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS k) ks GROUP BY event_type, win_start ORDER BY event_type, win_start")),
    QueryDef("q_variant_extract", qVariantExtract, Some(
      "SELECT event_type, COUNT(*) AS cnt, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k FROM events GROUP BY event_type ORDER BY event_type")),
    QueryDef("q_events_extract_props", qEventsExtractProps, Some(
      "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k FROM events ORDER BY event_id")),
    QueryDef("q_events_sessions", qEventsSessions, Some(
      "WITH t AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events), s AS (SELECT user_id, ts, value, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM t) SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start")),
    QueryDef("q_asof_join", qAsofJoin, Some(
      "SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS prior_click FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND c.ts <= p.ts ORDER BY purchase_id")),
    QueryDef("q_asof_forward", qAsofForward, Some(
      // window mirror of the forward as-of (DuckDB's ASOF sugar is
      // backward-oriented; the window form is the portable statement)
      "WITH u AS (SELECT user_id, ts, event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id, 0 AS is_p FROM events WHERE event_type = 'click' UNION ALL SELECT user_id, ts, CAST(NULL AS BIGINT), event_id, 1 FROM events WHERE event_type = 'purchase'), w AS (SELECT *, first_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts ASC, is_p DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click FROM u) SELECT purchase_id, user_id, next_click FROM w WHERE purchase_id IS NOT NULL ORDER BY purchase_id"))
  )
}
