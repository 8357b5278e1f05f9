package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.util.Det
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q24 family — event-time windowing over the `events` table (SURVEY §2.11).
  * The reference has no streaming; these declare the engine's extension
  * surface. Batch-checkable vs DuckDB: every window is expressed through
  * epoch-second arithmetic that is identical in both engines (timestamps are
  * exported as epoch BIGINTs, never raw timestamps, to dodge tz/precision
  * encoding differences between writers). The streaming twins of these ops
  * (Trigger/watermark behavior) live in graft.streaming and are unit-tested
  * with a memory source.
  */
object EventQueries {

  // ---------------------------------------------------------------- Q24a
  /** Tumbling 1-hour window ≡ date_trunc groupBy. Spark's `window()` would
    * emit a struct column; date_trunc is the same computation and exports
    * cleanly. value sums are exact integer cents. */
  val q24a = DeclaredQuery(
    "q24a_tumbling",
    Some(s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
            |       event_type, COUNT(*) AS n,
            |       ${Det.sql.sumMoney("value")} AS total_value
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    Tables.events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        Det.unCents(sum(Det.cents(col("value")))).as("total_value"))
      .orderBy("hour_epoch", "event_type")
  }

  // ---------------------------------------------------------------- Q24b
  /** Sliding window (1 h length, 15 min slide): every event lands in 4
    * windows. Spark uses the native `window()` generator; the oracle expands
    * the same 4 windows arithmetically — both align windows to epoch 0. */
  val q24b = DeclaredQuery(
    "q24b_sliding",
    Some("""SELECT ws AS window_start, event_type, COUNT(*) AS n FROM (
           |  SELECT CAST(FLOOR(epoch(ts)/900) AS BIGINT)*900 - k*900 AS ws, event_type
           |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k))
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
  }

  // ---------------------------------------------------------------- Q24c
  /** Sessionization, gaps-and-islands form: lag + cumulative flag sum with a
    * 30-minute gap (SURVEY Q24c). Both sides compare floored epoch seconds
    * so the boundary predicate is integer-exact. */
  val q24c = DeclaredQuery(
    "q24c_session",
    Some("""WITH e AS (
           |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |         ts
           |  FROM events WHERE user_id IS NOT NULL),
           |f AS (
           |  SELECT user_id, event_id, es,
           |         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
           |              OR lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |              THEN 1 ELSE 0 END AS new_session
           |  FROM e),
           |g AS (
           |  SELECT user_id, event_id, es,
           |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_nr
           |  FROM f)
           |SELECT user_id, session_nr, COUNT(*) AS n_events,
           |       MIN(es) AS session_start, MAX(es) AS session_end,
           |       MAX(es) - MIN(es) AS duration_sec
           |FROM g GROUP BY user_id, session_nr
           |ORDER BY user_id, session_nr""".stripMargin)) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byUserEs = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id").isNotNull) // sessions need an identity (NULLS.md 5)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("new_session",
        when(col("es") - lag(col("es"), 1).over(byUser) > 1800
          || lag(col("es"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_nr", sum(col("new_session")).over(byUserEs))
      .groupBy("user_id", "session_nr")
      .agg(count(lit(1)).as("n_events"),
        min(col("es")).as("session_start"),
        max(col("es")).as("session_end"),
        (max(col("es")) - min(col("es"))).as("duration_sec"))
      .orderBy("user_id", "session_nr")
  }

  // ---------------------------------------------------------------- Q26j
  /** JSON surface over events.props: get_json_object extraction + group
    * aggregate (SURVEY §2.8 events extension). The oracle extracts the same
    * value by regexp so it does not depend on DuckDB's JSON extension. */
  val q26j = DeclaredQuery(
    "q26j_json_extract",
    Some("""SELECT event_type,
           |       CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
           |       COUNT(*) AS n
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- Q24d
  /** Spark-native `session_window` in batch mode (the same operator the
    * streaming path uses, StreamingOps.sessions) — oracle mirrors the
    * gaps-and-islands semantics on raw fractional-second epochs (events
    * are exactly μs-valued, so both engines see identical doubles;
    * session end = last event + gap).
    *
    * BOUNDARY (r16, found by the GRAFT_EVENT_SKEW oracle gate on its
    * first run — the q117 recipe): Spark's session_window merge is
    * INCLUSIVE at the gap — an event arriving exactly gap after the
    * previous one still EXTENDS the session (windows [t, t+gap) and
    * [t+gap, t+2·gap) merge on start2 <= end1). The r15 oracle declared
    * `>= 1800` a new session and diverged by 89 sessions the moment the
    * corpus contained exact-1800.000000 s gaps; `> 1800` is Spark's
    * actual rule and now both engines pin it. */
  val q24d = DeclaredQuery(
    "q24d_session_window",
    Some("""WITH e AS (SELECT user_id, event_id, epoch(ts) AS es FROM events
           |           WHERE user_id IS NOT NULL),
           |f AS (SELECT user_id, event_id, es,
           |        CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
           |g AS (SELECT user_id, es,
           |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS snr
           |      FROM f)
           |SELECT user_id, MIN(es) AS start_epoch, MAX(es) + 1800.0 AS end_epoch,
           |       COUNT(*) AS n_events
           |FROM g GROUP BY user_id, snr ORDER BY user_id, start_epoch""".stripMargin)) { (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("double").as("start_epoch"),
        col("session_window.end").cast("double").as("end_epoch"),
        col("n_events"))
      .orderBy("user_id", "start_epoch")
  }

  // ---------------------------------------------------------------- Q58
  /** Backward as-of join (operators.AsOfJoin, SURVEY §2.13 X20): every
    * `error` event picks up the most recent `click` by the same user
    * at-or-before it, within a 1-hour tolerance — the canonical "state at
    * the time of the event" temporal join Spark lacks as a built-in.
    *
    * The oracle replays the operator's exact union + per-key running-window
    * semantics (last_value IGNORE NULLS over (ts, side, tiebreak) order) —
    * the same spec DuckDB's native ASOF JOIN implements, spelled out so
    * tie/tolerance behavior is pinned, not inherited.
    *
    * Timestamps export as epoch-microsecond BIGINTs (events are exactly
    * μs-valued, q24d note). Match-miss rows keep integer sentinels instead
    * of NULLs: a nullable BIGINT round-trips through pandas as float64 and
    * the driver's hasher is dtype-sensitive (check_oracle.py note).
    *
    * Scale shape: ONE hash shuffle on user_id + per-key sort (the q24c
    * sessionization cost class); running state is one payload struct per
    * key. No range-join explosion, no global window. */
  val q58 = DeclaredQuery(
    "q58_asof_join",
    Some("""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS eus, value FROM events WHERE event_type = 'click'),
           |x AS (SELECT user_id, event_id, epoch_us(ts) AS eus FROM events WHERE event_type = 'error'),
           |u AS (
           |  SELECT user_id, eus, event_id, 0 AS side, event_id AS p_id, eus AS p_eus, value AS p_val FROM c
           |  UNION ALL
           |  SELECT user_id, eus, event_id, 1, NULL, NULL, NULL FROM x),
           |w AS (
           |  SELECT user_id, eus, event_id, side,
           |         last_value(p_id IGNORE NULLS) OVER win AS m_id,
           |         last_value(p_eus IGNORE NULLS) OVER win AS m_eus,
           |         last_value(p_val IGNORE NULLS) OVER win AS m_val
           |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY eus, side, event_id
           |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |t AS (SELECT event_id, user_id, eus,
           |             CASE WHEN eus - m_eus <= 3600000000 THEN m_id END AS ck_id,
           |             CASE WHEN eus - m_eus <= 3600000000 THEN m_eus END AS ck_eus,
           |             CASE WHEN eus - m_eus <= 3600000000 THEN m_val END AS ck_val
           |      FROM w WHERE side = 1)
           |SELECT event_id, user_id, eus AS error_eus,
           |       (ck_id IS NOT NULL) AS has_click,
           |       CAST(COALESCE(ck_id, -1) AS BIGINT) AS click_id,
           |       COALESCE(ck_val, 0.0) AS click_value,
           |       CAST(COALESCE(eus - ck_eus, -1) AS BIGINT) AS gap_us
           |FROM t ORDER BY event_id""".stripMargin)) { (s, d) =>
    val ev = Tables.events(s, d).withColumn("eus", unix_micros(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "eus")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "eus", "value")
    graft.operators.AsOfJoin.backward(
        errors, clicks, keys = Seq("user_id"), ts = "eus",
        tiebreak = "event_id", payload = Seq("event_id", "value"),
        prefix = "click_", tolerance = Some(lit(3600L * 1000000L)))
      .select(col("event_id"), col("user_id"), col("eus").as("error_eus"),
        col("click_event_id").isNotNull.as("has_click"),
        coalesce(col("click_event_id"), lit(-1L)).as("click_id"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"),
        coalesce(col("eus") - col("click_eus"), lit(-1L)).as("gap_us"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- Q93
  /** X56: batch interval join — every error event enriched with ALL clicks
    * by the same user in the preceding hour (count, exact money sum, min
    * gap). The "all matches in range" companion to q58's as-of (last match
    * only): the attribution-window shape behind ads/metrics pipelines.
    *
    * Scale shape: a naive `user_id` equi-join with a range predicate pays
    * per-user quadratic blowup on hot keys; instead both sides bucket by
    * `eus DIV window` so a probe touches exactly 2 buckets (window length
    * = bucket width) and the equi-join key is (user_id, bucket) — the
    * range refine runs on bucket-local candidates. Integer bucket
    * arithmetic (DIV), no window functions, one hash shuffle per side;
    * left-outer keeps match-less errors (sentinels, not NULLs —
    * check_oracle dtype note on q58). */
  val q93 = DeclaredQuery(
    "q93_interval_join",
    Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS eus FROM events WHERE event_type = 'error'),
            |c AS (SELECT user_id, epoch_us(ts) AS ceus, value FROM events WHERE event_type = 'click')
            |SELECT e.event_id, e.user_id, e.eus AS error_eus,
            |       COUNT(c.ceus) AS n_clicks,
            |       CAST(COALESCE(SUM(${Det.sql.cents("c.value")}), 0) AS DOUBLE)/1e2 AS clicks_value,
            |       CAST(COALESCE(MIN(e.eus - c.ceus), -1) AS BIGINT) AS min_gap_us
            |FROM e LEFT JOIN c
            |  ON e.user_id = c.user_id AND c.ceus <= e.eus AND e.eus - c.ceus <= 3600000000
            |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)) { (s, d) =>
    val HourUs = 3600L * 1000000L
    val ev = Tables.events(s, d).withColumn("eus", unix_micros(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("eus"))
      .withColumn("bucket",
        explode(array(expr(s"eus DIV $HourUs"), expr(s"eus DIV $HourUs") - 1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("eus").as("ceus"), col("value"),
        expr(s"eus DIV $HourUs").as("c_bucket"))
    errors
      .join(clicks,
        col("user_id") === col("c_user") && col("bucket") === col("c_bucket") &&
          col("ceus") <= col("eus") && col("eus") - col("ceus") <= HourUs,
        "left_outer")
      .groupBy(col("event_id"), col("user_id"), col("eus"))
      .agg(count(col("ceus")).as("n_clicks"),
        Det.unCents(coalesce(sum(Det.cents(col("value"))), lit(0L))).as("clicks_value"),
        coalesce(min(col("eus") - col("ceus")), lit(-1L)).as("min_gap_us"))
      .select(col("event_id"), col("user_id"), col("eus").as("error_eus"),
        col("n_clicks"), col("clicks_value"), col("min_gap_us"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- Q96
  /** X59: rolling event-time features — per event, the count and exact
    * money sum of the same user's events in the trailing 7 days (RANGE
    * frame, ties-as-peers per the SQL standard, identical in both
    * engines). The per-entity rolling-feature shape every feature store
    * materializes.
    *
    * Scale shape: the window partitions by user_id — key cardinality
    * grows with the corpus, so partitions stay bounded (this is the
    * GOOD window shape; contrast q95's scaladoc for the few-huge-groups
    * case). One hash shuffle + per-key sort; running state is the
    * frame's cents sum.
    *
    * SKEW POSTURE (r16): the engine does NOT evaluate the sliding
    * range frame directly — Spark's SlidingWindowFunctionFrame rebuilds
    * the aggregation buffer from scratch every time a bound moves
    * (declarative aggregates have no retraction), so a both-bounds-
    * moving time frame costs O(rows × frame) PER KEY. Measured on the
    * GRAFT_EVENT_SKEW sf10 corpus (one user holding 10% of 10M events):
    * a single task burned 22+ CPU-minutes in
    * SlidingWindowFunctionFrame.write — the hot-key window is the
    * classic feature-store job-killer. The rewrite evaluates the same
    * contract as the DIFFERENCE OF TWO CUMULATIVES:
    *
    *   rolling[t−X, t] = cum[≤ t] − cum[≤ t−X−1]
    *
    * exact for integer-µs event times and ties-as-peers RANGE
    * semantics. Both frames have an UNBOUNDED lower bound, which Spark
    * evaluates with UnboundedPrecedingWindowFunctionFrame — rows are
    * only ever ADDED as the upper bound advances, O(n) amortized per
    * key — and both share one WindowExec (same partition/order). The
    * hot key drops from quadratic to linear; the oracle SQL keeps the
    * declarative rolling-frame spelling (it pins the ANSWER, not the
    * plan). count() over an empty frame is 0; sum() is NULL → coalesce
    * to 0 cents. */
  val q96 = DeclaredQuery(
    "q96_rolling_window",
    Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS eus, value FROM events)
            |SELECT event_id, user_id, eus,
            |       COUNT(*) OVER w AS n_7d,
            |       CAST(SUM(${Det.sql.cents("value")}) OVER w AS DOUBLE)/1e2 AS value_7d
            |FROM e
            |WINDOW w AS (PARTITION BY user_id ORDER BY eus
            |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
            |ORDER BY event_id""".stripMargin)) { (s, d) =>
    val sevenDaysUs = 7L * 86400L * 1000000L
    val wCum = Window.partitionBy(col("user_id")).orderBy(col("eus"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wBefore = Window.partitionBy(col("user_id")).orderBy(col("eus"))
      .rangeBetween(Window.unboundedPreceding, -sevenDaysUs - 1L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("eus"), col("value"))
      .select(col("event_id"), col("user_id"), col("eus"),
        (count(lit(1)).over(wCum) - count(lit(1)).over(wBefore)).as("n_7d"),
        Det.unCents(
          sum(Det.cents(col("value"))).over(wCum) -
            coalesce(sum(Det.cents(col("value"))).over(wBefore), lit(0L)))
          .as("value_7d"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- Q97
  /** X61: ordered event funnel — the product-analytics primitive: of the
    * users who VIEWed, how many CLICKed within 24 h of their first view,
    * and of those how many PURCHASEd within 24 h of that click. Steps
    * are time-ordered per user (strictly after the previous step's
    * time), so this is a sequence pattern, not three independent counts.
    *
    * Scale shape: NO windows and no per-user event sorting — each step
    * is a user-keyed hash-agg (min over the step's filtered events)
    * followed by an equi-join back to the next step's events on
    * user_id; per-user state is one timestamp per step. Three
    * map-side-combinable aggs + three 1:N joins, all on the same
    * user_id key (one shuffle partitioning reused), final frame is one
    * row exploded to the 3-step report. Funnel-over-100-TB cost = the
    * cost of three filtered scans.
    *
    * Conversion fractions divide exact BIGINT counts in DOUBLE —
    * bit-identical in both engines; gap totals stay integer μs. */
  val q97 = DeclaredQuery(
    "q97_event_funnel",
    Some(s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS eus FROM events),
            |v AS (SELECT user_id, MIN(eus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
            |c AS (SELECT e.user_id, MIN(e.eus) AS t2, MIN(v.t1) AS t1
            |      FROM e JOIN v ON e.user_id = v.user_id
            |      WHERE e.event_type = 'click' AND e.eus > v.t1
            |        AND e.eus - v.t1 <= 86400000000
            |      GROUP BY 1),
            |p AS (SELECT e.user_id, MIN(e.eus) AS t3, MIN(c.t2) AS t2
            |      FROM e JOIN c ON e.user_id = c.user_id
            |      WHERE e.event_type = 'purchase' AND e.eus > c.t2
            |        AND e.eus - c.t2 <= 86400000000
            |      GROUP BY 1),
            |a AS (SELECT COUNT(v.t1) AS n1, COUNT(c.t2) AS n2, COUNT(p.t3) AS n3,
            |             CAST(COALESCE(SUM(c.t2 - c.t1), 0) AS BIGINT) AS sg2,
            |             CAST(COALESCE(SUM(p.t3 - p.t2), 0) AS BIGINT) AS sg3
            |      FROM v LEFT JOIN c ON v.user_id = c.user_id
            |             LEFT JOIN p ON v.user_id = p.user_id)
            |SELECT * FROM (
            |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type, n1 AS users,
            |         CAST(1.0 AS DOUBLE) AS conv_from_prev,
            |         CAST(0 AS BIGINT) AS total_gap_us FROM a
            |  UNION ALL
            |  SELECT 2, 'click', n2,
            |         CASE WHEN n1 = 0 THEN 0e0 ELSE CAST(n2 AS DOUBLE) / n1 END, sg2 FROM a
            |  UNION ALL
            |  SELECT 3, 'purchase', n3,
            |         CASE WHEN n2 = 0 THEN 0e0 ELSE CAST(n3 AS DOUBLE) / n2 END, sg3 FROM a)
            |ORDER BY step""".stripMargin)) { (s, d) =>
    val DayUs = 86400L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("eus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("eus")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("eus") > col("t1") && col("eus") - col("t1") <= DayUs)
      .groupBy("user_id").agg(min(col("eus")).as("t2"), min(col("t1")).as("ct1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("t2")), "user_id")
      .filter(col("eus") > col("t2") && col("eus") - col("t2") <= DayUs)
      .groupBy("user_id").agg(min(col("eus")).as("t3"), min(col("t2")).as("pt2"))
    val a = v
      .join(c.select(col("user_id"), col("t2"), col("ct1")), Seq("user_id"), "left_outer")
      .join(p.select(col("user_id"), col("t3"), col("pt2")), Seq("user_id"), "left_outer")
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"),
        coalesce(sum(col("t2") - col("ct1")), lit(0L)).as("sg2"),
        coalesce(sum(col("t3") - col("pt2")), lit(0L)).as("sg3"))
    a.select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("step_type"),
          col("n1").as("users"), lit(1.0).as("conv_from_prev"),
          lit(0L).as("total_gap_us")),
        struct(lit(2L).as("step"), lit("click").as("step_type"),
          col("n2").as("users"),
          when(col("n1") === 0, 0.0)
            .otherwise(col("n2").cast("double") / col("n1")).as("conv_from_prev"),
          col("sg2").as("total_gap_us")),
        struct(lit(3L).as("step"), lit("purchase").as("step_type"),
          col("n3").as("users"),
          when(col("n2") === 0, 0.0)
            .otherwise(col("n3").cast("double") / col("n2")).as("conv_from_prev"),
          col("sg3").as("total_gap_us")))).as("r"))
      .select(col("r.step").as("step"), col("r.step_type").as("step_type"),
        col("r.users").as("users"), col("r.conv_from_prev").as("conv_from_prev"),
        col("r.total_gap_us").as("total_gap_us"))
      .orderBy("step")
  }

  // ---------------------------------------------------------------- Q98
  /** X62: cohort retention — users grouped by first-seen week (the
    * cohort), then for each (cohort, week offset) the count of cohort
    * members active that week and the retained fraction. The
    * engagement-analytics twin of q97's acquisition funnel.
    *
    * Scale shape: one user-keyed hash-agg for first-seen, one
    * user-keyed join + distinct for (user, offset) activity, one
    * cohort-keyed count — all map-side-combinable, keys (user, then
    * cohort-week) grow with the corpus. Cohort sizes are a
    * weeks-of-history-sized frame, joined BROADCAST. Week arithmetic
    * is integer epoch-μs DIV, identical in both engines; retention
    * divides exact BIGINTs in DOUBLE. */
  val q98 = DeclaredQuery(
    "q98_cohort_retention",
    Some(s"""WITH e AS (SELECT DISTINCT user_id,
            |                  epoch_us(ts) // 604800000000 AS wk FROM events),
            |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1),
            |s AS (SELECT cohort_wk, COUNT(*) AS cohort_size FROM f GROUP BY 1),
            |r AS (SELECT f.cohort_wk, e.wk - f.cohort_wk AS offset_wk,
            |             COUNT(*) AS active_users
            |      FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2)
            |SELECT r.cohort_wk, r.offset_wk, r.active_users, s.cohort_size,
            |       CAST(r.active_users AS DOUBLE) / s.cohort_size AS retention
            |FROM r JOIN s ON r.cohort_wk = s.cohort_wk
            |ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    val WeekUs = 7L * 86400L * 1000000L
    val e = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("wk"))
      .distinct()
    val f = e.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val sizes = f.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_size"))
    val r = e.join(f, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(count(lit(1)).as("active_users"))
    r.join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("offset_wk"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size")).as("retention"))
      .orderBy("cohort_wk", "offset_wk")
  }

  // ---------------------------------------------------------------- Q99
  /** X63: rolling weekly-active-users via MERGEABLE per-day sketches —
    * the 100 TB distinct-over-window pattern: a windowed COUNT(DISTINCT)
    * cannot pre-aggregate (distinct is not summable), so at scale you
    * keep one bounded sketch per (day) and answer ANY trailing window by
    * merging ≤window states, never rescanning raw events. KMV's closure
    * property (k-min of a union = k-min of the union of per-part k-mins,
    * Beyer et al. SIGMOD'07) makes the merged estimate exactly
    * reproducible from the day-state table; the oracle replays the same
    * k-th-order-statistic arithmetic from md5 strings.
    *
    * Scale shape: raw events → (day, user) DISTINCT pre-agg (map-side
    * combinable) → day-keyed KMV state (O(K)=64 longs per day) → a
    * 7-offset explode of the days-of-history-sized state table →
    * re-sketch per target day over ≤7·K values. The exact count rides
    * along from the same pre-agg (7-offset explode + distinct) for the
    * rel_err column — at production scale you'd drop that arm and keep
    * only the O(days·K) path. */
  val q99 = DeclaredQuery(
    "q99_rolling_wau",
    Some(s"""WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
            |                  md5(CAST(user_id AS VARCHAR)) AS h FROM events
            |            WHERE user_id IS NOT NULL),
            |dh AS (SELECT DISTINCT day, ${Det.sql.hex60("h")} AS hv FROM du),
            |td AS (SELECT DISTINCT day FROM dh),
            |w2 AS (SELECT DISTINCT t.day AS day, d.hv
            |       FROM td t JOIN dh d ON d.day BETWEEN t.day - 6 AND t.day),
            |r AS (SELECT day, hv,
            |             row_number() OVER (PARTITION BY day ORDER BY hv) AS rk,
            |             COUNT(*) OVER (PARTITION BY day) AS nd FROM w2),
            |kth AS (SELECT day, nd, hv AS kv FROM r WHERE rk = LEAST(nd, 64)),
            |est AS (SELECT day,
            |               CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            |                    ELSE 63e0 * 1152921504606846976 / CAST(kv AS DOUBLE)
            |               END AS approx_wau,
            |               LEAST(nd, 64) AS support, nd AS exact_wau FROM kth)
            |SELECT day, approx_wau, support, exact_wau,
            |       abs(approx_wau - exact_wau) / exact_wau AS rel_err
            |FROM est ORDER BY day""".stripMargin)) { (s, d) =>
    import graft.operators.KmvSketch
    val DayUs = 86400L * 1000000L
    val dh = Tables.events(s, d)
      .filter(col("user_id").isNotNull) // WAU counts identities (NULLS.md 5)
      .select(expr(s"unix_micros(ts) DIV $DayUs").as("day"), col("user_id"))
      .distinct()
      .select(col("day"), Det.hex60(md5(col("user_id").cast("string"))).as("hv"))
    // bounded arm: one ≤64-long state per day, merged across the window
    val st = dh.groupBy("day").agg(KmvSketch.state(col("hv")).as("st"))
    val tdays = st.select(col("day"))
    val approx = st
      .select(explode(sequence(lit(0L), lit(6L))).as("off"), col("day"), col("st"))
      .select((col("day") + col("off")).as("day"), explode(col("st")).as("hv"))
      .join(tdays, Seq("day"), "left_semi")
      .groupBy("day").agg(KmvSketch(col("hv")).as("kmv"))
    // exact arm (rel_err evidence): window union from the same pre-agg
    val exact = dh
      .select(explode(sequence(lit(0L), lit(6L))).as("off"), col("day"), col("hv"))
      .select((col("day") + col("off")).as("day"), col("hv"))
      .join(tdays, Seq("day"), "left_semi")
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("exact_wau"))
    approx.join(exact, "day")
      .select(col("day"), col("kmv.estimate").as("approx_wau"),
        col("kmv.support").as("support"), col("exact_wau"),
        (abs(col("kmv.estimate") - col("exact_wau")) / col("exact_wau"))
          .as("rel_err"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- Q100
  /** X64: session path analysis — the transition matrix over event types
    * (view→click, click→purchase, …) counted over SAME-SESSION adjacent
    * event pairs. Because sessions are defined by the 30-minute gap rule
    * (q24c), "consecutive within a session" is exactly "adjacent in the
    * user's timeline with gap ≤ 1800 s" — so no session numbering pass
    * is needed: one LEAD over the user-partitioned order and a gap
    * filter. The Markov-chain input behind next-action models and
    * funnel discovery (q97 checks a KNOWN path; this surfaces the
    * paths).
    *
    * Scale shape: user-partitioned window (keys grow with the corpus —
    * the good shape, q96's note), then a 25-row-bounded hash-agg. */
  val q100 = DeclaredQuery(
    "q100_session_paths",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
           |p AS (SELECT event_type AS prev_type,
           |             lead(event_type) OVER w AS next_type,
           |             lead(es) OVER w - es AS gap
           |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
           |SELECT prev_type, next_type, COUNT(*) AS n
           |FROM p WHERE next_type IS NOT NULL AND gap <= 1800
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
      .select(col("event_type").as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (lead(col("es"), 1).over(w) - col("es")).as("gap"))
      .filter(col("next_type").isNotNull && col("gap") <= 1800)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  // ---------------------------------------------------------------- Q101
  /** X65: pivot with EXPLICIT values — per-user event counts fanned into
    * one column per event type (the wide activity-matrix export every
    * BI handoff wants). Spark's `pivot(col)` without a value list runs
    * an extra distinct-values job and breaks schema stability at scale;
    * the explicit-list form compiles to plain conditional aggregation —
    * one user-keyed map-side-combinable shuffle, schema fixed at plan
    * time. The oracle spells the same conditional aggregation. */
  val q101 = DeclaredQuery(
    "q101_pivot_activity",
    Some("""SELECT user_id,
           |       COUNT(*) FILTER (WHERE event_type = 'click') AS "click",
           |       COUNT(*) FILTER (WHERE event_type = 'error') AS "error",
           |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           |       COUNT(*) FILTER (WHERE event_type = 'signup') AS "signup",
           |       COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
           |FROM events WHERE user_id IS NOT NULL
           |GROUP BY user_id ORDER BY user_id""".stripMargin)) { (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L) // a user with no events of a type pivots to null; the
                   // conditional-agg oracle counts 0 — same meaning
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q102
  /** X66: hourly anomaly flags — hours whose event count deviates ≥ 3σ
    * from that event type's mean hourly count (population σ over the
    * observed hours). The ops-monitoring primitive on top of q24a's
    * tumbling agg.
    *
    * Exactness: the z² test is evaluated in INTEGER arithmetic —
    * z² > 9 ⟺ (x·cnt − sum)² > 9·(cnt·sumsq − sum²) with x, cnt, sum,
    * sumsq all exact BIGINTs — so the flag can never drift between
    * engines on a rounding edge; the reported z-score divides exact
    * integers and takes one IEEE sqrt (correctly rounded, identical in
    * both engines). Two hash-aggs + a 5-row broadcast join; no windows. */
  val q102 = DeclaredQuery(
    "q102_hourly_anomaly",
    Some("""WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           |                  event_type, COUNT(*) AS n
           |           FROM events GROUP BY 1, 2),
           |s AS (SELECT event_type, COUNT(*) AS cnt, SUM(n) AS sum_n,
           |             SUM(n * n) AS sumsq FROM h GROUP BY 1)
           |SELECT h.hour_epoch, h.event_type, h.n,
           |       CASE WHEN CAST(s.cnt AS BIGINT) * s.sumsq - s.sum_n * s.sum_n = 0 THEN 0e0
           |            ELSE (CAST(h.n * s.cnt - s.sum_n AS DOUBLE))
           |                 / sqrt(CAST(CAST(s.cnt AS BIGINT) * s.sumsq - s.sum_n * s.sum_n AS DOUBLE))
           |       END AS zscore,
           |       (h.n * s.cnt - s.sum_n) * (h.n * s.cnt - s.sum_n)
           |         > 9 * (CAST(s.cnt AS BIGINT) * s.sumsq - s.sum_n * s.sum_n) AS is_anomaly
           |FROM h JOIN s ON h.event_type = s.event_type
           |ORDER BY h.hour_epoch, h.event_type""".stripMargin)) { (s, d) =>
    val hourly = Tables.events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sumsq"))
    val num = col("n") * col("cnt") - col("sum_n")
    val den = col("cnt") * col("sumsq") - col("sum_n") * col("sum_n")
    hourly.join(broadcast(stats), "event_type")
      .select(col("hour_epoch"), col("event_type"), col("n"),
        when(den === 0, 0.0)
          .otherwise(num.cast("double") / sqrt(den.cast("double"))).as("zscore"),
        (num * num > lit(9L) * den).as("is_anomaly"))
      .orderBy("hour_epoch", "event_type")
  }

  // ---------------------------------------------------------------- Q104
  /** X68: audience overlap from KMV set algebra — union size,
    * intersection size, and Jaccard of two user sets (viewers ∩
    * purchasers) estimated from their BOUNDED sketches, never the sets:
    * at 100 TB the audiences live on different tables/clusters and only
    * the O(64)-long states travel. Estimators (Beyer et al. SIGMOD'07):
    * the merged k-min M = kmin(stA ∪ stB) IS kmin(A ∪ B) (closure), so
    * union follows the q23 k-th-order-statistic law; ρ̂ = |{h ∈ M : h ∈
    * stA ∧ h ∈ stB}| / |M| estimates Jaccard (membership against the
    * states is EXACT for members of M); intersection = ρ̂ · union. The
    * oracle replays M from the raw union's order statistics — equal by
    * the closure property — so every estimate hash-matches bit-for-bit;
    * exact counts ride along for the rel-err columns.
    *
    * Scale shape: two filtered distinct-aggs to O(k) states, a 1×1
    * cross join, array algebra on ≤128 longs — no set ever shuffles. */
  val q104 = DeclaredQuery(
    "q104_audience_overlap",
    Some(s"""WITH ua AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
            |ub AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
            |va AS (SELECT DISTINCT ${Det.sql.hex60("h")} AS hv FROM ua),
            |vb AS (SELECT DISTINCT ${Det.sql.hex60("h")} AS hv FROM ub),
            |vu AS (SELECT hv FROM va UNION SELECT hv FROM vb),
            |m AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rk,
            |             COUNT(*) OVER () AS nu FROM vu),
            |mk AS (SELECT hv, nu FROM m WHERE rk <= 64),
            |kth AS (SELECT nu, MAX(hv) AS kv, COUNT(*) AS msz FROM mk GROUP BY nu),
            |kint AS (SELECT COUNT(*) AS ki FROM mk
            |         WHERE hv IN (SELECT hv FROM va) AND hv IN (SELECT hv FROM vb)),
            |ex AS (SELECT (SELECT COUNT(*) FROM va) AS exact_a,
            |              (SELECT COUNT(*) FROM vb) AS exact_b,
            |              (SELECT COUNT(*) FROM va WHERE hv IN (SELECT hv FROM vb)) AS exact_inter),
            |est AS (SELECT CASE WHEN kth.msz < 64 THEN CAST(kth.msz AS DOUBLE)
            |                    ELSE 63e0 * 1152921504606846976 / CAST(kth.kv AS DOUBLE)
            |               END AS union_est,
            |               CAST(kint.ki AS DOUBLE) / kth.msz AS jaccard_est
            |        FROM kth, kint)
            |SELECT ex.exact_a, ex.exact_b, ex.exact_inter,
            |       CAST(ex.exact_inter AS DOUBLE)
            |         / (ex.exact_a + ex.exact_b - ex.exact_inter) AS jaccard_exact,
            |       est.union_est, est.jaccard_est,
            |       est.jaccard_est * est.union_est AS inter_est
            |FROM ex, est""".stripMargin)) { (s, d) =>
    import graft.operators.KmvSketch
    val K = KmvSketch.K
    val ev = Tables.events(s, d)
      .filter(col("user_id").isNotNull) // audiences are identities (NULLS.md 5)
      .select(col("event_type"), Det.hex60(md5(col("user_id").cast("string"))).as("hv"))
    def arm(t: String, n: String, st: String) =
      ev.filter(col("event_type") === t).select("hv").distinct()
        .agg(count(lit(1)).as(n), KmvSketch.state(col("hv")).as(st))
    val joined = arm("view", "exact_a", "sta")
      .crossJoin(arm("purchase", "exact_b", "stb"))
    val inter = ev.filter(col("event_type") === "view").select("hv").distinct()
      .join(ev.filter(col("event_type") === "purchase").select("hv").distinct(), "hv")
      .agg(count(lit(1)).as("exact_inter"))
    joined.crossJoin(inter)
      .withColumn("m", slice(array_sort(array_union(col("sta"), col("stb"))), 1, K))
      .withColumn("msz", size(col("m")))
      .withColumn("ki",
        size(array_intersect(array_intersect(col("m"), col("sta")), col("stb"))))
      .withColumn("union_est",
        when(col("msz") < K, col("msz").cast("double"))
          .otherwise(lit(63.0) * lit((1L << 60).toDouble)
            / element_at(col("m"), K).cast("double")))
      .withColumn("jaccard_est", col("ki").cast("double") / col("msz"))
      .select(col("exact_a"), col("exact_b"), col("exact_inter"),
        (col("exact_inter").cast("double")
          / (col("exact_a") + col("exact_b") - col("exact_inter")))
          .as("jaccard_exact"),
        col("union_est"), col("jaccard_est"),
        (col("jaccard_est") * col("union_est")).as("inter_est"))
  }

  // ---------------------------------------------------------------- Q107
  /** X72: SCD Type-2 history build — compact each user's event-type
    * timeline into versioned validity intervals (valid_from, valid_to,
    * is_current), the slowly-changing-dimension shape every warehouse
    * keeps for point-in-time joins (it is the build side q58's as-of
    * join would probe).
    *
    * Two user-partitioned windows, zero shuffles beyond the one
    * partition-by-user exchange (both windows share it): LAG drops
    * no-change rows (run-length compaction), then LEAD/ROW_NUMBER over
    * the surviving change rows assign each version its interval and
    * ordinal. Ties on timestamp break on event_id, so the history is
    * deterministic. At 100 TB the state is per-user — keys grow with
    * the corpus, no global window (the q96/q100 discipline).
    */
  val q107 = DeclaredQuery(
    "q107_scd2_history",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
           |           WHERE user_id IS NOT NULL),
           |c AS (SELECT *, lag(event_type) OVER
           |        (PARTITION BY user_id ORDER BY es, event_id) AS prev
           |      FROM e),
           |ch AS (SELECT user_id, event_type, es, event_id FROM c
           |       WHERE prev IS NULL OR prev <> event_type)
           |SELECT user_id,
           |       row_number() OVER w AS version,
           |       event_type AS attr_value,
           |       es AS valid_from,
           |       lead(es) OVER w AS valid_to,
           |       CASE WHEN lead(es) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
           |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
           |ORDER BY user_id, version""".stripMargin)) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val ch = Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    ch.select(col("user_id"),
        row_number().over(byUser).as("version"),
        col("event_type").as("attr_value"),
        col("es").as("valid_from"),
        lead(col("es"), 1).over(byUser).as("valid_to"),
        when(lead(col("es"), 1).over(byUser).isNull, 1).otherwise(0)
          .as("is_current"))
      .orderBy("user_id", "version")
  }

  // ---------------------------------------------------------------- Q110
  /** X74: point-in-time (AS OF) join of the event stream against q107's
    * SCD2 history — the consume side of the slowly-changing dimension:
    * every event is attributed to the state its user was in AT THAT
    * INSTANT (`valid_from <= es < valid_to`, current row open-ended),
    * then rolled up to (state, event_type) with exact cent sums. The
    * classic "revenue by customer segment as it was at purchase time"
    * shape that naive latest-state joins get wrong.
    *
    * Plan: the history build is q107's two shared-exchange windows; the
    * as-of itself is an EQUI hash join on user_id with the interval
    * containment as an in-key filter — per-user history is run-length
    * compacted (≤ changes, not events), so the join never explodes the
    * way a pure range join would, and both sides shuffle once on the
    * same key. Exactly one interval contains each event (intervals
    * chain and zero-length ties are empty), so the inner join is total
    * — no event is dropped or double-attributed.
    */
  val q110 = DeclaredQuery(
    "q110_scd2_asof",
    Some(s"""WITH e AS (SELECT user_id, event_id, event_type, value,
            |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
            |c AS (SELECT *, lag(event_type) OVER
            |        (PARTITION BY user_id ORDER BY es, event_id) AS prev
            |      FROM e),
            |ch AS (SELECT user_id, event_type, es, event_id FROM c
            |       WHERE prev IS NULL OR prev <> event_type),
            |h AS (SELECT user_id, event_type AS state, es AS valid_from,
            |             lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
            |               AS valid_to
            |      FROM ch)
            |SELECT h.state, e.event_type, COUNT(*) AS n,
            |       ${Det.sql.sumMoney("e.value")} AS total_value
            |FROM e JOIN h ON e.user_id = h.user_id
            |  AND h.valid_from <= e.es
            |  AND (h.valid_to IS NULL OR e.es < h.valid_to)
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_timestamp(col("ts")).as("es"))
    val hist = e
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("es"), 1).over(byUser))
      .select(col("user_id").as("h_user"), col("event_type").as("state"),
        col("es").as("valid_from"), col("valid_to"))
    e.join(hist,
        col("user_id") === col("h_user") &&
          col("valid_from") <= col("es") &&
          (col("valid_to").isNull || col("es") < col("valid_to")))
      .groupBy(col("state"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Det.unCents(sum(Det.cents(col("value")))).as("total_value"))
      .orderBy("state", "event_type")
  }

  // ---------------------------------------------------------------- Q112
  /** X76: time-grid resampling with forward fill — each user's event
    * stream regularized onto a dense hourly grid spanning their active
    * window, observed hours carrying the exact-cent hourly value sum and
    * gap hours filled by last-observation-carried-forward (LOCF), then
    * summarized per user (grid size, observed/gap counts, LOCF value
    * mass). The gap-fill shape every time-series feature pipeline needs
    * before computing lags/rolling stats on irregular event data.
    *
    * Plan: one scan → hourly hash-agg (map-side combinable) → per-user
    * min/max span → `sequence`+`explode` generates each user's grid
    * WITHOUT a global calendar join (grid rows are born partitioned by
    * user) → left join back on (user, hour), co-partitioned — AQE sees
    * both sides hashed on the same keys → LOCF via `last(ignoreNulls)`
    * over a user-partitioned window (never a global window) → per-user
    * rollup. The first grid hour is observed by construction (the span
    * comes from the data), so the fill is total.
    *
    * Determinism: hour ids are exact integer division of epoch seconds;
    * value mass rides integer cents; LOCF is order-unique because hours
    * are distinct within a user.
    */
  val q112 = DeclaredQuery(
    "q112_gap_fill",
    Some("""WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |                 value FROM events WHERE user_id IS NOT NULL),
           |hourly AS (SELECT user_id, es // 3600 AS h,
           |                  SUM(CAST(ROUND((value)*100) AS BIGINT)) AS cent
           |           FROM e GROUP BY 1, 2),
           |span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
           |         FROM hourly GROUP BY 1),
           |grid AS (SELECT user_id, UNNEST(generate_series(h0, h1)) AS h
           |         FROM span),
           |j AS (SELECT g.user_id, g.h, hourly.cent FROM grid g
           |      LEFT JOIN hourly ON g.user_id = hourly.user_id
           |                      AND g.h = hourly.h),
           |f AS (SELECT user_id, cent,
           |             LAST_VALUE(cent IGNORE NULLS) OVER
           |               (PARTITION BY user_id ORDER BY h
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |               AS filled
           |      FROM j)
           |SELECT user_id, COUNT(*) AS n_hours, COUNT(cent) AS n_observed,
           |       COUNT(*) - COUNT(cent) AS n_gap,
           |       CAST(SUM(filled) AS DOUBLE)/1e2 AS locf_value_sum
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"), col("value"))
    val hourly = e
      .groupBy(col("user_id"), expr("es DIV 3600").as("h"))
      .agg(sum(Det.cents(col("value"))).as("cent"))
    // r18: the previous plan exploded each user's FULL hour span into a
    // grid (span-sized rows — the query's sf10 cost), left-joined hourly
    // back, ran the LOCF window, and re-aggregated. Every reported value
    // is a function of the user's observed (h, cent) pairs alone, so one
    // user-keyed agg + the LocfGridStats sort-and-sweep kernel (segment
    // length × running value ≡ the grid's hour-by-hour LOCF sum,
    // spec-pinned in TextKernelsSpec) replaces grid + join + window.
    // The pair list is bounded by the user's event count — the same
    // bound the old window partition had.
    val k = {
      import org.apache.spark.sql.graftshim.ColumnShim
      ColumnShim.column(graft.expressions.LocfGridStats(
        ColumnShim.expression(collect_list(struct(col("h"), col("cent"))))))
    }
    hourly.groupBy("user_id").agg(k.as("_k"))
      .select(col("user_id"),
        col("_k.n_hours").as("n_hours"),
        col("_k.n_observed").as("n_observed"),
        (col("_k.n_hours") - col("_k.n_observed")).as("n_gap"),
        Det.unCents(col("_k.locf_cent_sum")).as("locf_value_sum"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q113
  /** X77: multi-touch attribution — every purchase's value split equally
    * (exact integer cents: `DIV` shares, remainder to the LAST touch)
    * across the user's view/click touches in the preceding 7 days;
    * purchases with no touch land in an `(unattributed)` bucket. The
    * marketing-analytics shape naive last-touch reports get wrong, and a
    * conservation law makes it oracle-exact: the attributed cent mass
    * equals the purchase cent mass to the cent, by construction.
    *
    * Plan: one scan split into two slim arms → LEFT equi join on
    * user_id with the 7-day lookback as an in-key range filter (per-user
    * touches bound the fan-out — never a time-only cross join) → two
    * windows partitioned by purchase id (bounded by that purchase's
    * touch count) → hash-agg to 3 rows. All arithmetic is integer
    * cents; the remainder rule (`rn = 1` on es DESC, event_id DESC) is
    * a total order, so the split is deterministic in both engines.
    */
  val q113 = DeclaredQuery(
    "q113_attribution",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |                 CAST(ROUND((value)*100) AS BIGINT) AS cent
           |          FROM events),
           |p AS (SELECT user_id, event_id AS p_id, es AS p_es, cent FROM e
           |      WHERE event_type = 'purchase'),
           |t AS (SELECT user_id, event_id AS t_id, event_type AS t_type,
           |             es AS t_es
           |      FROM e WHERE event_type IN ('view', 'click')),
           |j AS (SELECT p.p_id, p.cent, t.t_id, t.t_type, t.t_es FROM p
           |      LEFT JOIN t ON p.user_id = t.user_id
           |                 AND t.t_es >= p.p_es - 604800
           |                 AND t.t_es < p.p_es),
           |w AS (SELECT p_id, cent, t_type,
           |             COUNT(t_id) OVER (PARTITION BY p_id) AS n,
           |             ROW_NUMBER() OVER (PARTITION BY p_id
           |                                ORDER BY t_es DESC, t_id DESC)
           |               AS rn
           |      FROM j),
           |a AS (SELECT CASE WHEN n = 0 THEN '(unattributed)'
           |                  ELSE t_type END AS channel,
           |             CASE WHEN n = 0 THEN cent
           |                  ELSE cent // n +
           |                       CASE WHEN rn = 1 THEN cent % n ELSE 0 END
           |             END AS alloc
           |      FROM w)
           |SELECT channel, COUNT(*) AS n_alloc,
           |       CAST(SUM(alloc) AS DOUBLE)/1e2 AS attributed_value
           |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_timestamp(col("ts")).as("es"),
      Det.cents(col("value")).as("cent"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("es").as("p_es"), col("cent"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("event_type").as("t_type"), col("es").as("t_es"))
    val byP = Window.partitionBy(col("p_id"))
    val j = p.join(t,
        col("user_id") === col("t_user") &&
          col("t_es") >= col("p_es") - 604800 && col("t_es") < col("p_es"),
        "left")
      .withColumn("n", count(col("t_id")).over(byP))
      .withColumn("rn", row_number().over(
        byP.orderBy(col("t_es").desc, col("t_id").desc)))
    j.select(
        when(col("n") === 0, lit("(unattributed)")).otherwise(col("t_type"))
          .as("channel"),
        when(col("n") === 0, col("cent"))
          .otherwise(expr("cent DIV n") +
            when(col("rn") === 1, col("cent") % col("n")).otherwise(lit(0L)))
          .as("alloc"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_alloc"),
        Det.unCents(sum(col("alloc"))).as("attributed_value"))
      .orderBy("channel")
  }

  // ---------------------------------------------------------------- Q114
  /** X78: CUSUM change-point scan per user — the classic mean-shift
    * detector over each user's spend series, kept EXACT by scaling out
    * the division: the centered cumulative sum S_i = Σ(x_j − x̄) is
    * rational, but n·S_i = n·prefix_i − i·total is an integer of cents,
    * so the argmax (the most likely change point) and the max statistic
    * are computed with zero floating point and agree bit-for-bit across
    * engines. Bound: |n·prefix| ≤ n·Σ|cents| — per-user events × cent
    * mass keeps it well inside int64 through sf10 (documented; a 100 TB
    * deployment shards long series by (user, epoch-window) first).
    *
    * Plan: one scan → user-partitioned windows (row-number, running
    * prefix, per-user totals — ONE shared exchange on user_id) → the
    * argmax is a max-then-min-index join back (deterministic under
    * ties, unlike max_by) on the same user key, so no second shuffle
    * of the series.
    */
  val q114 = DeclaredQuery(
    "q114_cusum",
    Some("""WITH e AS (SELECT user_id, event_id,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |                 CAST(ROUND((value)*100) AS BIGINT) AS cent
           |          FROM events),
           |o AS (SELECT user_id, cent,
           |             ROW_NUMBER() OVER
           |               (PARTITION BY user_id ORDER BY es, event_id) AS i,
           |             CAST(SUM(cent) OVER
           |               (PARTITION BY user_id ORDER BY es, event_id
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |               AS BIGINT) AS pre,
           |             COUNT(*) OVER (PARTITION BY user_id) AS n,
           |             CAST(SUM(cent) OVER (PARTITION BY user_id) AS BIGINT)
           |               AS tot
           |      FROM e),
           |s AS (SELECT user_id, i, n, ABS(n * pre - i * tot) AS abs_s
           |      FROM o),
           |m AS (SELECT user_id, MAX(n) AS n, MAX(abs_s) AS max_abs_s
           |      FROM s GROUP BY 1)
           |SELECT m.user_id, m.n, m.max_abs_s, MIN(s.i) AS arg_i
           |FROM m JOIN s ON m.user_id = s.user_id
           |             AND s.abs_s = m.max_abs_s
           |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
    val ordered = byUser.orderBy(col("es"), col("event_id"))
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("es"), Det.cents(col("value")).as("cent"))
    val st = e
      .withColumn("i", row_number().over(ordered))
      .withColumn("pre", sum(col("cent")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("tot", sum(col("cent")).over(byUser))
      .select(col("user_id"), col("i"), col("n"),
        abs(col("n") * col("pre") - col("i") * col("tot")).as("abs_s"))
    val m = st.groupBy("user_id")
      .agg(max("n").as("n"), max("abs_s").as("max_abs_s"))
    m.join(st.select(col("user_id").as("s_user"), col("i"), col("abs_s")),
        col("user_id") === col("s_user") && col("abs_s") === col("max_abs_s"))
      .groupBy("user_id", "n", "max_abs_s")
      .agg(min("i").as("arg_i"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q130
  /** X94: attribution-model comparison — first-touch, last-touch, and
    * linear attribution of every purchase computed side by side FROM
    * ONE SCAN, per channel. The report a marketing team uses to see how
    * much the model choice itself moves the numbers; a conservation law
    * ties the three columns together (each model attributes exactly the
    * same total cent mass — q113's rule applied three ways), so the
    * comparison can't silently leak value.
    *
    * Plan: q113's join shape (equi join on user_id, 7-day lookback as
    * in-key range filter, INNER — touchless purchases have nothing to
    * attribute in any model), then THREE window functions on the SAME
    * purchase-partitioned exchange (count + two row_numbers over
    * opposite orders) — one shuffle serves all three models; the final
    * hash-agg emits one row per channel with the three valuations.
    */
  val q130 = DeclaredQuery(
    "q130_attribution_models",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |                 CAST(ROUND((value)*100) AS BIGINT) AS cent
           |          FROM events),
           |p AS (SELECT user_id, event_id AS p_id, es AS p_es, cent FROM e
           |      WHERE event_type = 'purchase'),
           |t AS (SELECT user_id, event_id AS t_id, event_type AS t_type,
           |             es AS t_es
           |      FROM e WHERE event_type IN ('view', 'click')),
           |j AS (SELECT p.p_id, p.cent, t.t_id, t.t_type, t.t_es FROM p
           |      JOIN t ON p.user_id = t.user_id
           |            AND t.t_es >= p.p_es - 604800
           |            AND t.t_es < p.p_es),
           |w AS (SELECT p_id, cent, t_type,
           |             COUNT(*) OVER (PARTITION BY p_id) AS n,
           |             ROW_NUMBER() OVER (PARTITION BY p_id
           |                                ORDER BY t_es, t_id) AS rn_first,
           |             ROW_NUMBER() OVER (PARTITION BY p_id
           |                                ORDER BY t_es DESC, t_id DESC)
           |               AS rn_last
           |      FROM j),
           |a AS (SELECT t_type,
           |             CASE WHEN rn_first = 1 THEN cent ELSE 0 END
           |               AS first_touch,
           |             CASE WHEN rn_last = 1 THEN cent ELSE 0 END
           |               AS last_touch,
           |             cent // n +
           |               CASE WHEN rn_last = 1 THEN cent % n ELSE 0 END
           |               AS linear
           |      FROM w)
           |SELECT t_type AS channel,
           |       CAST(SUM(first_touch) AS DOUBLE)/1e2 AS first_touch_value,
           |       CAST(SUM(last_touch) AS DOUBLE)/1e2 AS last_touch_value,
           |       CAST(SUM(linear) AS DOUBLE)/1e2 AS linear_value
           |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_timestamp(col("ts")).as("es"),
      Det.cents(col("value")).as("cent"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("es").as("p_es"), col("cent"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("event_type").as("t_type"), col("es").as("t_es"))
    val byP = Window.partitionBy(col("p_id"))
    val j = p.join(t,
        col("user_id") === col("t_user") &&
          col("t_es") >= col("p_es") - 604800 && col("t_es") < col("p_es"))
      .withColumn("n", count(lit(1)).over(byP))
      .withColumn("rn_first", row_number().over(
        byP.orderBy(col("t_es"), col("t_id"))))
      .withColumn("rn_last", row_number().over(
        byP.orderBy(col("t_es").desc, col("t_id").desc)))
    j.select(col("t_type"),
        when(col("rn_first") === 1, col("cent")).otherwise(lit(0L))
          .as("first_touch"),
        when(col("rn_last") === 1, col("cent")).otherwise(lit(0L))
          .as("last_touch"),
        (expr("cent DIV n") +
          when(col("rn_last") === 1, col("cent") % col("n"))
            .otherwise(lit(0L))).as("linear"))
      .groupBy(col("t_type").as("channel"))
      .agg(Det.unCents(sum(col("first_touch"))).as("first_touch_value"),
        Det.unCents(sum(col("last_touch"))).as("last_touch_value"),
        Det.unCents(sum(col("linear"))).as("linear_value"))
      .orderBy("channel")
  }

  // ---------------------------------------------------------------- Q132
  /** X96: growth accounting — the daily active-user ledger every product
    * team reports: per day, NEW (first-ever active day), RETAINED
    * (also active the previous day), RESURRECTED (active today, absent
    * yesterday, seen before), and CHURNED (active yesterday, absent
    * today, dated to the day they went missing). Two conservation laws
    * make it oracle-exact and spec-checkable: new+retained+resurrected
    * = DAU(d), and retained(d) = DAU(d−1) − churned(d).
    *
    * Plan: DISTINCT (user, day) once → per-user MIN(day) and LAG(day)
    * ride ONE user-partitioned exchange (the groupBy reuses the window's
    * hash partitioning); churn is a self anti-join on (user, day+1) —
    * co-partitioned on user, never time-only. All counts exact integers.
    */
  val q132 = DeclaredQuery(
    "q132_growth_accounting",
    Some("""WITH ud AS (SELECT DISTINCT user_id,
           |                   CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400
           |                     AS day
           |            FROM events WHERE user_id IS NOT NULL),
           |f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
           |lagd AS (SELECT user_id, day,
           |                LAG(day) OVER (PARTITION BY user_id
           |                               ORDER BY day) AS prev_day
           |         FROM ud),
           |cls AS (SELECT l.day,
           |               CASE WHEN l.day = f.first_day THEN 'new'
           |                    WHEN l.prev_day = l.day - 1 THEN 'retained'
           |                    ELSE 'resurrected' END AS status
           |        FROM lagd l JOIN f ON l.user_id = f.user_id),
           |churn AS (SELECT a.day + 1 AS day, COUNT(*) AS churned
           |          FROM ud a LEFT JOIN ud b
           |            ON a.user_id = b.user_id AND b.day = a.day + 1
           |          WHERE b.user_id IS NULL GROUP BY 1)
           |SELECT c.day,
           |       CAST(SUM(CASE WHEN status='new' THEN 1 ELSE 0 END)
           |            AS BIGINT) AS new_users,
           |       CAST(SUM(CASE WHEN status='retained' THEN 1 ELSE 0 END)
           |            AS BIGINT) AS retained,
           |       CAST(SUM(CASE WHEN status='resurrected' THEN 1 ELSE 0
           |                END) AS BIGINT) AS resurrected,
           |       CAST(COALESCE(MAX(ch.churned), 0) AS BIGINT)
           |         AS churned_from_prev
           |FROM cls c LEFT JOIN churn ch ON c.day = ch.day
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val ud = Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400").as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val lagd = ud
      .withColumn("prev_day", lag(col("day"), 1).over(byUser))
      .withColumn("first_day", min(col("day")).over(
        Window.partitionBy(col("user_id"))))
    val cls = lagd.select(col("day"),
      when(col("day") === col("first_day"), lit("new"))
        .when(col("prev_day") === col("day") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("status"))
    val churn = ud.as("a")
      .join(ud.select(col("user_id").as("bu"), col("day").as("bd")),
        col("user_id") === col("bu") && col("bd") === col("day") + 1,
        "left_anti")
      .groupBy((col("day") + 1).as("day"))
      .agg(count(lit(1)).as("churned"))
    cls.groupBy("day")
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
      .join(churn.select(col("day").as("cd"), col("churned")),
        col("day") === col("cd"), "left")
      .select(col("day"), col("new_users"), col("retained"),
        col("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned_from_prev"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- Q133
  /** X97: time-to-convert percentiles — per signup-week cohort, the
    * exact nearest-rank p50/p90 of hours from signup to FIRST purchase.
    * The activation metric growth teams pair with q98's retention and
    * q132's ledger.
    *
    * Exact without a global sort: lags quantize to HOUR buckets (the
    * metric's natural granularity), the per-cohort cumulative count runs
    * over a BOUNDED bucket frame (≤ hours in the data span, partitioned
    * by cohort — q14/q94's inverse-CDF recipe), and the percentile is
    * the nearest-rank read-off 2·cum ≥ n in pure integers.
    */
  val q133 = DeclaredQuery(
    "q133_time_to_convert",
    Some("""WITH e AS (SELECT user_id, event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
           |          FROM events),
           |su AS (SELECT user_id, MIN(es) AS signup_es FROM e
           |       WHERE event_type = 'signup' GROUP BY 1),
           |pu AS (SELECT user_id, MIN(es) AS first_purchase_es FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |lagh AS (SELECT su.user_id,
           |                su.signup_es // 604800 AS cohort_week,
           |                (pu.first_purchase_es - su.signup_es) // 3600
           |                  AS lag_h
           |         FROM su JOIN pu ON su.user_id = pu.user_id
           |         WHERE pu.first_purchase_es >= su.signup_es),
           |h AS (SELECT cohort_week, lag_h, COUNT(*) AS cnt
           |      FROM lagh GROUP BY 1, 2),
           |c AS (SELECT cohort_week, lag_h, cnt,
           |             CAST(SUM(cnt) OVER (PARTITION BY cohort_week
           |                  ORDER BY lag_h ROWS BETWEEN UNBOUNDED
           |                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
           |             CAST(SUM(cnt) OVER (PARTITION BY cohort_week)
           |                  AS BIGINT) AS n
           |      FROM h)
           |SELECT cohort_week, MAX(n) AS n_converted,
           |       MIN(CASE WHEN 2*cum >= n THEN lag_h END) AS p50_hours,
           |       MIN(CASE WHEN 10*cum >= 9*n THEN lag_h END) AS p90_hours
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("es")).as("signup_es"))
    val pu = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu_user"))
      .agg(min(col("es")).as("first_purchase_es"))
    val lagh = su.join(pu, col("user_id") === col("pu_user"))
      .filter(col("first_purchase_es") >= col("signup_es"))
      .select(expr("signup_es DIV 604800").as("cohort_week"),
        expr("(first_purchase_es - signup_es) DIV 3600").as("lag_h"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    val c = lagh.groupBy("cohort_week", "lag_h")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        byCohort.orderBy(col("lag_h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(byCohort))
    c.groupBy("cohort_week")
      .agg(max(col("n")).as("n_converted"),
        min(when(col("cum") * 2 >= col("n"), col("lag_h"))).as("p50_hours"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lag_h")))
          .as("p90_hours"))
      .orderBy("cohort_week")
  }

  val all: Seq[DeclaredQuery] =
    Seq(q24a, q24b, q24c, q24d, q26j, q58, q93, q96, q97, q98, q99, q100,
      q101, q102, q104, q107, q110, q112, q113, q114, q130, q132, q133)
}
