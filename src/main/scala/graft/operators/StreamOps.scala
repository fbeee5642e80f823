package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Event-time windowing inventory (SURVEY §2.3 "Streaming"; Q-T1..T5).
  *
  * Each query here is the BATCH frame of the corresponding Structured
  * Streaming computation — same `window()`/`session_window()` expressions,
  * same results — so it is DuckDB-oracle-checkable. The streaming-mode
  * equivalents (readStream over MemoryStream + watermark + append/update
  * output) are exercised in StreamingSpec; graft.streaming.StreamJobs holds
  * the readStream builders.
  *
  * The lease-expiry arithmetic of the reference (timestamp comparison,
  * reference core/datastore.go:240-253) is the watermark shape of Q-T5.
  *
  * 100 TB notes: tumbling/sliding windows are plain hash aggs on
  * (window, keys) — partial agg before the shuffle; the sliding window
  * multiplies rows by |window|/|slide| (4× here) BEFORE partial agg, which
  * is the standard cost. Session windows shuffle once on user_id then merge
  * sorted runs per key. Streaming state (dedup set, open sessions) is
  * bounded by the watermark horizon — without it state grows unboundedly.
  */
object StreamOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q-T1: tumbling 1-hour window counts.
    "t1_tumbling" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("ws"), col("cnt"))
        .orderBy("ws")
    }),

    // Q-T2: sliding window 1 h / 15 min — avg event value per window.
    // round→decimal→sum→double keeps the avg exact across engines.
    "t2_sliding" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(
          (sum(col("value").cast("decimal(18,2)")).cast("double")
            / count(lit(1))).as("avg_value"),
          count(lit(1)).as("cnt"))
        .select(col("w.start").as("ws"), col("avg_value"), col("cnt"))
        .orderBy("ws")
    }),

    // Q-T3: session windows per user, 30-minute gap. Session start = min ts
    // of the run; a gap of exactly 30 min still MERGES (session end is
    // inclusive: [ts, ts+gap]), mirrored by strict `>` in the oracle's
    // island SQL (verified by StreamingSpec's exact-boundary case).
    "t3_session" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("w.start").as("session_start"), col("cnt"))
        .orderBy("user_id", "session_start")
    }),

    // Q-T4: deterministic dedup — earliest event per (user_id, event_type)
    // by (ts, event_id). The streaming twin is dropDuplicates within a
    // watermark (StreamingSpec); batch uses row_number so the kept row is
    // well-defined, unlike dropDuplicates' arbitrary pick.
    "t4_dedup" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    }),

    // Q-T5: watermark analog — only events within 1 h of the stream's max
    // ts ("on time") are aggregated into 15-min tumbling counts. The real
    // late-data drop (withWatermark) is asserted in StreamingSpec; this is
    // the on-time subset the oracle can check.
    "t5_watermark_ontime" -> ((s, d) => {
      val ev = t(s, d, "events")
      val mx = ev.agg(max(col("ts")).as("mx"))
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") >= col("mx") - expr("INTERVAL 1 HOUR"))
        .groupBy(window(col("ts"), "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("ws"), col("cnt"))
        .orderBy("ws")
    }),

    // T6: funnel / conversion analysis — per user: first signup, first
    // purchase AT OR AFTER it, purchase count after signup, and whether
    // the user converted within 7 days. The event-sequence primitive of
    // product analytics. Scale shape: one equi-join on user_id (hash
    // shuffle both sides once) with the time predicate evaluated inside
    // the join, then a partial-agg min/count — no per-user window sort,
    // no driver-side state.
    "t6_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("signup_ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("uid"), col("ts").as("pts"))
      signup
        .join(purch,
          col("uid") === col("user_id") && col("pts") >= col("signup_ts"),
          "left")
        .groupBy("user_id", "signup_ts")
        .agg(min("pts").as("first_purchase_ts"),
          count(col("pts")).as("n_purchases"))
        .withColumn("converted",
          col("first_purchase_ts").isNotNull &&
            col("first_purchase_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"))
        .select("user_id", "signup_ts", "first_purchase_ts",
          "n_purchases", "converted")
        .orderBy("user_id")
    }),

    // T7: time-series resample + gap fill — regularize the event stream
    // onto a dense per-user hourly grid (sequence() between the user's
    // first and last active hour), then forward-fill the hours with no
    // events from the last observed hourly total (last(_, ignoreNulls)
    // over a per-user running frame). The resample-then-ffill primitive of
    // every telemetry/feature-store pipeline (pandas resample().ffill()).
    // Scale shape: one hash agg to hourly, one grid explode bounded by the
    // user's active timespan, one equi join back, and a window that is
    // per-user (bounded keys, never a global sort). Hourly totals ride
    // DECIMAL(18,2) internally so the fill value is exact across engines;
    // the FINAL column is cast to DOUBLE (one fixed op on identical exact
    // operands) — output schemas never carry DecimalType (hasher parity).
    "t7_resample_gapfill" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("v"))
      val grid = hourly.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
            .as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(w)
            .cast("double").as("v_filled"),
          when(col("v").isNull, 1).otherwise(0).as("is_gap"))
        .orderBy("user_id", "h")
    }),

    // T8: cohort retention — users bucketed by first-event week (their
    // cohort), then for every (cohort, weeks-since-cohort) cell, how many
    // of the cohort's users were still active. The retention-matrix
    // primitive of product analytics. Scale shape: two hash aggregations
    // (first-event per user, distinct user-weeks) and two equi joins —
    // every stage keyed and partial-agg friendly, no windows, nothing
    // quadratic. (The synthetic fixture lands every user in one cohort;
    // the plan shape is cohort-count-independent.)
    "t8_cohort_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
      val firsts = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).as("cohort_wk"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val joined = activity.join(firsts, "user_id")
        .select(col("user_id"), col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_k"))
      val sizes = firsts.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_size"))
      joined.groupBy("cohort_wk", "week_k")
        .agg(countDistinct("user_id").as("n_active"))
        .join(sizes, "cohort_wk")
        .select(col("cohort_wk"), col("week_k"), col("n_active"),
          col("cohort_size"))
        .orderBy("cohort_wk", "week_k")
    }),

    // T9: event-sequence transition matrix — what each user does NEXT:
    // per-user event streams ordered by time, adjacent (type → next_type)
    // transitions counted globally with the distinct-user reach of each
    // edge. The Markov/path-analysis primitive behind funnels (t6 is one
    // path through this matrix). Scale shape: lead() over a per-user
    // window (bounded keys) then one hash aggregation — the corpus-sized
    // analog of a session graph, no joins, nothing quadratic.
    "t9_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          lead("event_type", 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
        .orderBy("from_type", "to_type")
    }),

    // T10: inter-arrival analysis — per-user gap distribution (median /
    // p95 / max microseconds between consecutive events). The burstiness
    // profile behind rate alerting, session-gap tuning (t3's 30 min), and
    // synthetic-load modeling. Gaps computed in exact integer
    // MICROSECONDS (unix_micros lag diff — whole-second truncation would
    // alias sub-second bursts); percentiles are Spark's exact percentile
    // over the per-user gap set (state O(gaps-per-user) — t12 is the
    // fixed-size-sketch twin for unbounded users). Scale shape: one
    // per-user window (lag) then one hash agg — bounded keys, no global
    // sort, same class as w2.
    "t10_interarrival" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(w)).as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, 0.5)").as("med_us"),
          expr("percentile(gap, 0.95)").as("p95_us"),
          max("gap").as("max_us"))
        .orderBy("user_id")
    }),

    // T12: t10's sketch twin — per-user gap percentiles on the
    // fixed-size approx_percentile digest instead of the exact per-group
    // value buffer (t10's state is O(gaps-per-user): bounded at current
    // fixtures, the memory ceiling when one user carries 10⁹ events).
    // Gap percentiles over LONG microseconds: percentile_approx on longs
    // returns longs — cast to double FIRST so both twin columns carry
    // the same type and the spec's relative-error bound is well-typed.
    "t12_approx_interarrival" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            lag(unix_micros(col("ts")), 1).over(w)).cast("double").as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          percentile_approx(col("gap"), lit(0.5), lit(10000)).as("med_approx"),
          expr("percentile(gap, 0.5)").as("med_exact"),
          percentile_approx(col("gap"), lit(0.95), lit(10000)).as("p95_approx"),
          expr("percentile(gap, 0.95)").as("p95_exact"))
        .orderBy("user_id")
    }),

    // T11: exponentially weighted moving average (bounded lookback) —
    // the smoothing primitive of telemetry/feature pipelines. True EWMA
    // is a sequential recurrence (not window-expressible without
    // nondeterministic float re-association); the production form is the
    // 16-term truncation with half-life decay 1/2: weights 2^-k are EXACT
    // binary doubles, the term chain is one FIXED left-associated
    // expression tree evaluated identically by any engine (no window
    // SUM, whose segment-tree association differs per engine), and the
    // normalizer 2 - 2^-15 is one exact constant division. Truncation
    // error ≤ 2^-16 of the oldest mass — below any telemetry noise
    // floor. One per-user window pass, 16 lags, no shuffle beyond the
    // user partition: w2 class.
    "t11_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val terms = (0 until 16).map(k =>
        coalesce(lag(col("value"), k).over(w), lit(0.0)) *
          lit(math.pow(2.0, -k)))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          (terms.reduceLeft(_ + _) / lit(2.0 - math.pow(2.0, -15)))
            .as("ewma"))
        .orderBy("user_id", "event_id")
    }),

    // T13: stream-stream join — view→click attribution: every view by
    // the same user within the 6 hours BEFORE a click. This is the
    // batch frame of the watermarked stream-stream interval join
    // (StreamJobs.clickViewJoin — same shape, 5-minute constant;
    // StreamingSpec pins the streaming twin's results and its state
    // bound). Scale shape: ONE hash shuffle of each side on user_id,
    // the time-range predicate evaluated INSIDE the join (output is the
    // true pair count, no blow-up); in streaming both sides' buffered
    // state is reclaimable once the watermark passes the range. 100 TB:
    // per-user fan-out is the true pair count — a skewed power user
    // salts like any hot equi-key.
    "t13_stream_stream_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"),
          col("event_id").as("view_id"), col("ts").as("view_ts"))
      clicks.join(views,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 6 HOURS") &&
          col("view_ts") <= col("click_ts"))
        .select("user_id", "click_id", "click_ts", "view_id", "view_ts")
        .orderBy("user_id", "click_id", "view_id")
    }),

    // T14: stream-stream LEFT OUTER join — t13 with view-less clicks
    // kept as null-padded rows (the attribution report wants "no view"
    // as a fact, not an absence). Streaming twin:
    // StreamJobs.clickViewJoinOuter, where the null row's emission is
    // WATERMARK-DRIVEN (a click is only provably view-less once the
    // watermark passes its join horizon — StreamingSpec pins that
    // timeline). Same scale shape as t13; the outer side adds no state
    // beyond the inner form's watermark-bounded buffers. Null view_ids
    // sort NULLS FIRST on both engines (Spark asc default, mirrored
    // explicitly in the oracle — DuckDB's asc default is NULLS LAST).
    "t14_stream_outer_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"),
          col("event_id").as("view_id"), col("ts").as("view_ts"))
      clicks.join(views,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 6 HOURS") &&
          col("view_ts") <= col("click_ts"), "left_outer")
        .select("user_id", "click_id", "click_ts", "view_id", "view_ts")
        .orderBy(col("user_id"), col("click_id"), col("view_id").asc_nulls_first)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t1_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY ws""".stripMargin,

    "t2_sliding" ->
      """SELECT make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k)
        |         * 900 * 1000000) AS ws,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_value,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
        |GROUP BY 1 ORDER BY ws""".stripMargin,

    "t3_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "t4_dedup" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "t5_watermark_ontime" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT)
        |         * 900 * 1000000) AS ws,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY ws""".stripMargin,

    "t6_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, CAST(s.signup_ts AS TIMESTAMP) AS signup_ts,
        |  CAST(min(p.ts) AS TIMESTAMP) AS first_purchase_ts,
        |  CAST(count(p.ts) AS BIGINT) AS n_purchases,
        |  (min(p.ts) IS NOT NULL
        |   AND min(p.ts) <= s.signup_ts + INTERVAL 7 DAY) AS converted
        |FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |GROUP BY s.user_id, s.signup_ts
        |ORDER BY s.user_id""".stripMargin,

    "t7_resample_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM bounds)
        |SELECT g.user_id, CAST(g.h AS TIMESTAMP) AS h,
        |  CAST(last_value(hh.v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS v_filled,
        |  CASE WHEN hh.v IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM grid g
        |LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
        |ORDER BY g.user_id, g.h""".stripMargin,

    "t8_cohort_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
        |  FROM events GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |joined AS (
        |  SELECT a.user_id, f.cohort_wk,
        |    CAST(date_diff('day', f.cohort_wk, a.wk) / 7 AS BIGINT) AS week_k
        |  FROM activity a JOIN firsts f ON a.user_id = f.user_id),
        |sizes AS (
        |  SELECT cohort_wk, count(*) AS cohort_size FROM firsts GROUP BY 1)
        |SELECT CAST(j.cohort_wk AS TIMESTAMP) AS cohort_wk, j.week_k,
        |  CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size
        |FROM joined j JOIN sizes s ON j.cohort_wk = s.cohort_wk
        |GROUP BY j.cohort_wk, j.week_k, s.cohort_size
        |ORDER BY cohort_wk, week_k""".stripMargin,

    "t9_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "t10_interarrival" ->
      """WITH d AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |  quantile_cont(gap, 0.5) AS med_us,
        |  quantile_cont(gap, 0.95) AS p95_us,
        |  CAST(max(gap) AS BIGINT) AS max_us
        |FROM d WHERE gap IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "t11_ewma" -> {
      val terms = (0 until 16).map(k =>
        s"coalesce(lag(value, $k) OVER w, 0.0) * ${math.pow(2.0, -k)}")
        .mkString(" + ")
      s"""SELECT user_id, event_id,
         |  ($terms) / ${2.0 - math.pow(2.0, -15)} AS ewma
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "t13_stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM events c JOIN events v ON c.user_id = v.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |  AND v.ts >= c.ts - INTERVAL 6 HOUR AND v.ts <= c.ts
        |ORDER BY c.user_id, click_id, view_id""".stripMargin,

    "t14_stream_outer_join" ->
      """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND v.ts >= c.ts - INTERVAL 6 HOUR AND v.ts <= c.ts
        |ORDER BY c.user_id, click_id, view_id NULLS FIRST""".stripMargin
  )
}
