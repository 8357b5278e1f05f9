package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Pins the as-of join's spec: inclusive/strict boundary behavior,
  * tie resolution among right rows, tolerance nulling, no-match rows,
  * and a model check against a brute-force lateral max. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    // (key, ts, id)
    ("a", 100L, 1L), ("a", 200L, 2L), ("a", 50L, 3L), ("b", 150L, 4L)
  ).toDF("k", "t", "id")

  private def right = Seq(
    // (key, ts, id, v)
    ("a", 100L, 10L, 1.0), ("a", 100L, 11L, 2.0), // tie at t=100
    ("a", 180L, 12L, 3.0),
    ("b", 160L, 13L, 4.0) // after b's only left row
  ).toDF("k", "t", "id", "v")

  test("inclusive match takes the at-or-before row; ties resolve to max tiebreak") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "id", Seq("id", "v"))
      .orderBy("id")
      .select("id", "asof_id", "asof_v", "asof_t")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    // id=1 at t=100: both right rows at 100 qualify (inclusive); id 11 wins
    assert(out(0) == ((1L, Some(11L), Some(2.0))))
    // id=2 at t=200: latest is t=180
    assert(out(1) == ((2L, Some(12L), Some(3.0))))
    // id=3 at t=50: nothing at-or-before
    assert(out(2) == ((3L, None, None)))
    // id=4 key b at t=150: b's only right row is at 160 (after) — no match
    assert(out(3) == ((4L, None, None)))
  }

  test("strict (inclusive=false) excludes equal timestamps") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "id", Seq("id"),
      inclusive = false)
      .filter(col("id") === 1).select("asof_id").collect()
    assert(out.head.isNullAt(0)) // t=100 rows no longer match the t=100 left row
  }

  test("tolerance nulls stale matches") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "id", Seq("id"),
      tolerance = Some(lit(10L)))
      .orderBy("id").select("asof_id").collect()
    assert(!out(0).isNullAt(0)) // gap 0 at t=100
    assert(out(1).isNullAt(0)) // gap 20 > 10 at t=200
  }

  test("matches a brute-force model on events sf0.001") {
    val ev = Tables.events(spark, sf0001).withColumn("eus", unix_micros(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "eus")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "eus", "value")
    val got = AsOfJoin.backward(errors, clicks, Seq("user_id"), "eus",
      "event_id", Seq("event_id"))
      .select(col("event_id"), coalesce(col("asof_event_id"), lit(-1L)).as("m"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // model: for each error, the click with max (eus, event_id) at-or-before
    val model = errors.as("e")
      .join(clicks.as("c"),
        col("e.user_id") === col("c.user_id") && col("c.eus") <= col("e.eus"),
        "left")
      .groupBy(col("e.event_id"))
      .agg(max(struct(col("c.eus"), col("c.event_id"))).as("best"))
      .select(col("event_id"), coalesce(col("best.event_id"), lit(-1L)).as("m"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == model.length && got.sameElements(model))
  }
}
