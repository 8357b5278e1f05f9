package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.util.Det
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (SURVEY §2.13 X83/X84): forecast evaluation
  * against a seasonal-naive baseline, and the clamped running balance —
  * the order-dependent recurrence SQL engines usually need recursion or
  * a UDF for, computed here with two plain windows via the reflection
  * identity.
  */
object TimeSeriesQueries {

  // ---------------------------------------------------------------- Q119
  /** X83: seasonal-naive forecast evaluation — per event type, forecast
    * each hour's event count with the count 168 hours (one week)
    * earlier, and report MAE and bias over every forecastable hour.
    * The baseline every forecasting system must beat, and the eval
    * harness shape (dense grid — missing hours COUNT AS ZERO, which a
    * sparse groupBy would silently skip and flatter the error).
    *
    * Plan: counts per (type, hour) hash-agg (the only data-sized pass)
    * → the dense grid is `types × sequence(span)` — BOUNDED BY THE
    * TIME SPAN, not the row count (5 types × #hours), so the
    * grid/self-join/eval tail is dimension-sized at any corpus scale →
    * the t−168 self-join is on the tiny dense frame. All errors are
    * exact integer count differences; mae_ppm is integer division.
    */
  val q119 = DeclaredQuery(
    "q119_forecast_eval",
    Some("""WITH e AS (SELECT event_type,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h
           |           FROM events),
           |cnt AS (SELECT event_type, h, COUNT(*) AS c FROM e GROUP BY 1, 2),
           |span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e),
           |types AS (SELECT DISTINCT event_type FROM e),
           |grid AS (SELECT t.event_type, g.h
           |         FROM types t,
           |              (SELECT UNNEST(generate_series(h0, h1)) AS h
           |               FROM span) g),
           |dense AS (SELECT g.event_type, g.h, COALESCE(cnt.c, 0) AS c
           |          FROM grid g LEFT JOIN cnt
           |            ON g.event_type = cnt.event_type AND g.h = cnt.h),
           |ev AS (SELECT a.event_type, a.c AS actual, f.c AS fcst
           |       FROM dense a JOIN dense f
           |         ON a.event_type = f.event_type AND f.h = a.h - 168
           |       WHERE a.h >= (SELECT h0 FROM span) + 168)
           |SELECT event_type, COUNT(*) AS n_hours,
           |       CAST(SUM(ABS(actual - fcst)) AS BIGINT) AS total_abs_err,
           |       CAST(SUM(actual - fcst) AS BIGINT) AS total_bias,
           |       (1000000 * CAST(SUM(ABS(actual - fcst)) AS BIGINT))
           |         // COUNT(*) AS mae_ppm
           |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("h"))
    val cnt = e.groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val span = e.agg(min("h").as("h0"), max("h").as("h1"))
    val types = e.select("event_type").distinct()
    val grid = types.crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val dense = grid.join(cnt, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val fcst = dense.select(col("event_type").as("f_type"),
      col("h").as("f_h"), col("c").as("fcst"))
    dense
      .join(fcst, col("event_type") === col("f_type") &&
        col("f_h") === col("h") - 168)
      .join(broadcast(span), col("h") >= col("h0") + 168)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("c") - col("fcst"))).as("total_abs_err"),
        sum(col("c") - col("fcst")).as("total_bias"))
      .withColumn("mae_ppm", expr("(1000000 * total_abs_err) div n_hours"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- Q120
  /** X84: clamped running balance — a prepaid ledger per user (purchases
    * credit, clicks debit) where the balance can never go below zero:
    * b_i = max(0, b_{i−1} + δ_i). The textbook order-dependent
    * recurrence that plain window functions "can't" express — and the
    * reason this query exists: by the reflection identity
    *
    *   b_i = prefix_i − min(0, min_{j≤i} prefix_j)
    *
    * the whole walk collapses to a running sum and a running min over
    * ONE user-partitioned ordered window, so Spark computes every
    * user's final and peak balance in a single exchange with zero
    * iteration. The ORACLE deliberately takes the other road — an
    * actual recursive CTE stepping the recurrence row by row — so the
    * hash match is a machine-checked proof of the identity on real
    * data (the q116 pattern: closed form vs recursion). TimeSeriesSpec
    * additionally replays the recurrence brute-force in the driver.
    *
    * Scale: identical posture to every per-user window in the suite —
    * partitioned by user, never global; 100 TB shards long ledgers by
    * (user, epoch-window) exactly as q114 documents.
    */
  val q120 = DeclaredQuery(
    "q120_clamped_balance",
    Some("""WITH RECURSIVE e AS (
           |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |         event_id,
           |         CASE WHEN event_type = 'purchase'
           |              THEN CAST(ROUND((value)*100) AS BIGINT)
           |              ELSE -CAST(ROUND((value)*100) AS BIGINT) END
           |           AS delta,
           |         ROW_NUMBER() OVER
           |           (PARTITION BY user_id
           |            ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
           |           AS i
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |    AND user_id IS NOT NULL),
           |n AS (SELECT user_id, MAX(i) AS n FROM e GROUP BY 1),
           |walk AS (
           |  SELECT e.user_id, e.i, GREATEST(0, e.delta) AS bal,
           |         GREATEST(0, e.delta) AS peak
           |  FROM e WHERE e.i = 1
           |  UNION ALL
           |  SELECT e.user_id, e.i, GREATEST(0, w.bal + e.delta),
           |         GREATEST(w.peak, GREATEST(0, w.bal + e.delta))
           |  FROM walk w JOIN e ON e.user_id = w.user_id AND e.i = w.i + 1)
           |SELECT w.user_id,
           |       CAST(w.bal AS DOUBLE)/1e2 AS final_balance,
           |       CAST(w.peak AS DOUBLE)/1e2 AS peak_balance
           |FROM walk w JOIN n ON w.user_id = n.user_id AND w.i = n.n
           |ORDER BY 1""".stripMargin)) { (s, d) =>
    val ordered = Window.partitionBy(col("user_id"))
      .orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"),
        when(col("event_type") === "purchase", Det.cents(col("value")))
          .otherwise(-Det.cents(col("value"))).as("delta"))
    val walked = e
      .withColumn("prefix", sum(col("delta")).over(ordered))
      .withColumn("runmin", min(col("prefix")).over(ordered))
      .withColumn("bal", col("prefix") - least(lit(0L), col("runmin")))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))))
    walked.groupBy("user_id")
      .agg(
        Det.unCents(max(struct(col("i"), col("bal"))).getField("bal"))
          .as("final_balance"),
        Det.unCents(max(col("bal"))).as("peak_balance"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q127
  /** X91: time-weighted average (TWAP) — each user's event value
    * averaged by HOW LONG it was the latest observation, not by event
    * count: Σ value_i·(t_{i+1}−t_i) / Σ(t_{i+1}−t_i). The financial/
    * telemetry averaging rule that plain AVG gets wrong on irregular
    * series (a value held for a week must outweigh one held a minute).
    *
    * Exactness: cents × seconds is an integer weighted sum (≤ ~1e10
    * per user here; the final ×100 read-off is widened through
    * HUGEINT/long headroom), and the TWAP is reported as an exact
    * integer of centi-cents by integer division — no floating point.
    * Plan: one LEAD window + one hash-agg, both on the user exchange.
    */
  val q127 = DeclaredQuery(
    "q127_twap",
    Some("""WITH e AS (SELECT user_id, event_id,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           |                 CAST(ROUND((value)*100) AS BIGINT) AS cent
           |          FROM events WHERE user_id IS NOT NULL),
           |w AS (SELECT user_id, cent, es,
           |             LEAD(es) OVER (PARTITION BY user_id
           |                            ORDER BY es, event_id) AS nxt
           |      FROM e),
           |h AS (SELECT user_id, SUM(cent * (nxt - es)) AS wsum,
           |             SUM(nxt - es) AS span
           |      FROM w WHERE nxt IS NOT NULL GROUP BY 1)
           |SELECT user_id, CAST(span AS BIGINT) AS span_s,
           |       CAST(CAST(wsum AS HUGEINT) * 100 // span AS BIGINT)
           |         AS twap_centi_cents
           |FROM h ORDER BY 1""".stripMargin)) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("es"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id").isNotNull) // identity rule (NULLS.md 5)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), Det.cents(col("value")).as("cent"))
      .withColumn("nxt", lead(col("es"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("cent") * (col("nxt") - col("es"))).as("wsum"),
        sum(col("nxt") - col("es")).as("span_s"))
      .select(col("user_id"), col("span_s"),
        expr("(wsum * 100) div span_s").as("twap_centi_cents"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q128
  /** X92: interval concurrency — per day, the maximum number of
    * simultaneously-active sessions (event start + 30 min), the
    * capacity/staffing question ("how many concurrent users must we
    * handle"). The classic sweep-line: +1 at each start, −1 at each
    * end, running sum, max.
    *
    * Plan: each interval EXPLODES to every day it touches (≤ 2 here —
    * the explode factor is interval/day length, bounded) and is
    * CLIPPED to that day, so a midnight-crossing session counts toward
    * BOTH days' concurrency and the running sum is a DAY-partitioned
    * window (never global; days bound the partition). The day span is
    * end-EXCLUSIVE ((es+1800−1) DIV 86400), so no zero-length clip is
    * ever emitted. End markers sort before starts at the same instant
    * (ORDER BY t, d, event_id with d = −1 < +1): touching intervals
    * don't overlap — the convention both engines replay
    * deterministically. (The spec's brute-force recount caught the
    * first draft assigning crossers only to their start day.)
    */
  val q128 = DeclaredQuery(
    "q128_concurrency",
    Some("""WITH e AS (SELECT user_id, event_id,
           |                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
           |          FROM events),
           |iv AS (SELECT UNNEST(generate_series(es // 86400,
           |                     (es + 1799) // 86400)) AS day,
           |              es, event_id
           |       FROM e),
           |cl AS (SELECT day, GREATEST(es, day * 86400) AS s,
           |              LEAST(es + 1800, (day + 1) * 86400) AS t,
           |              event_id
           |       FROM iv),
           |pm AS (SELECT day, s AS t, 1 AS d, event_id FROM cl
           |       UNION ALL SELECT day, t, -1, event_id FROM cl),
           |r AS (SELECT day,
           |             CAST(SUM(d) OVER (PARTITION BY day
           |                    ORDER BY t, d, event_id
           |                    ROWS BETWEEN UNBOUNDED PRECEDING
           |                    AND CURRENT ROW) AS BIGINT) AS conc
           |      FROM pm)
           |SELECT day, MAX(conc) AS max_concurrent,
           |       COUNT(*) // 2 AS n_active
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
    val iv = e.select(col("event_id"), col("es"),
      explode(sequence(expr("es DIV 86400"),
        expr("(es + 1799) DIV 86400"))).as("day"))
      .select(col("day"),
        greatest(col("es"), col("day") * 86400).as("s"),
        least(col("es") + 1800, (col("day") + 1) * 86400).as("t"),
        col("event_id"))
    val pm = iv.select(col("day"), col("s").as("t"), lit(1L).as("d"),
        col("event_id"))
      .unionByName(iv.select(col("day"), col("t"), lit(-1L).as("d"),
        col("event_id")))
    val sweep = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("d"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pm.withColumn("conc", sum(col("d")).over(sweep))
      .groupBy("day")
      .agg(max(col("conc")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_active"))
      .orderBy("day")
  }

  val all: Seq[DeclaredQuery] = Seq(q119, q120, q127, q128)
}
