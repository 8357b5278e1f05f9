package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** q97's ordered funnel and q98's cohort retention, pinned against
  * hand-built fixtures where the right answer is countable by eye —
  * the oracle proves engine parity, these prove the SEMANTICS
  * (ordering, 24 h step windows, cohort normalization) are the ones a
  * product analyst means. */
class FunnelSpec extends SparkSpec {

  private val DayUs = 86400L * 1000000L

  /** (user, type, eus) → events-shaped frame (other columns unused by q97
    * land as defaults so Tables.events' schema is satisfied via a temp
    * parquet dir). */
  private def eventsDir(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.zipWithIndex.map { case ((u, t, eus), i) =>
      (i.toLong, new java.sql.Timestamp(eus / 1000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel counts only time-ordered steps inside the 24h windows") {
    val base = 1700000000L * 1000000L
    val dir = eventsDir(Seq(
      // u1 converts fully: view < click (+1h) < purchase (+2h)
      (1L, "view", base),
      (1L, "click", base + 3600L * 1000000L),
      (1L, "purchase", base + 7200L * 1000000L),
      // u2 clicks BEFORE viewing — must not count as step 2
      (2L, "click", base - 3600L * 1000000L),
      (2L, "view", base),
      // u3 clicks 25h after viewing — outside the 24h window
      (3L, "view", base),
      (3L, "click", base + 25L * 3600L * 1000000L),
      // u4 views+clicks, purchase 30h after click — step 3 window missed
      (4L, "view", base),
      (4L, "click", base + 1000000L),
      (4L, "purchase", base + 1000000L + 30L * 3600L * 1000000L),
      // u5 never views; click+purchase alone must not enter the funnel
      (5L, "click", base),
      (5L, "purchase", base + 1000000L)))
    val rows = EventQueries.q97.build(spark, dir)
      .select("step", "users", "total_gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // step1: u1..u4 viewed; step2: u1 (1h gap) + u4 (1s gap); step3: u1
    assert(rows.map(_._2).toSeq == Seq(4L, 2L, 1L))
    assert(rows(1)._3 == 3600L * 1000000L + 1000000L) // u1 1h + u4 1s
    assert(rows(2)._3 == 3600L * 1000000L)            // u1 click→purchase
  }

  test("funnel is monotone and conversion ratios divide the step counts") {
    val rows = EventQueries.q97.build(spark, sf0001)
      .select("users", "conv_from_prev").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(0)._1 >= rows(1)._1 && rows(1)._1 >= rows(2)._1)
    assert(rows(0)._2 == 1.0)
    assert(rows(1)._2 == rows(1)._1.toDouble / rows(0)._1)
    assert(rows(2)._2 == rows(2)._1.toDouble / rows(1)._1)
  }

  test("cohort retention is 1.0 at offset 0 and bounded by cohort size") {
    val rows = EventQueries.q98.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, size, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(active <= size)
      if (off == 0L) assert(ret == 1.0,
        "every cohort member is active in their first-seen week by construction")
    }
    // offset-0 rows exist for every cohort present
    val cohorts = rows.map(_.getLong(0)).distinct.toSet
    val zeroOff = rows.filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    assert(zeroOff == cohorts)
  }
}
