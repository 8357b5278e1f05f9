package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** q93's bucketed interval join must equal the naive range join it
  * replaces — the bucketing is a plan optimization, never a semantics
  * change (boundary rows land exactly once via the 2-bucket probe). */
class IntervalJoinSpec extends SparkSpec {

  test("bucketed interval join equals the naive range join") {
    val HourUs = 3600L * 1000000L
    val ev = Tables.events(spark, sf0001).withColumn("eus", unix_micros(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("eus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("eus").as("ceus"), col("value"))
    val naive = errors.join(clicks,
        col("user_id") === col("c_user") &&
          col("ceus") <= col("eus") && col("eus") - col("ceus") <= HourUs,
        "left_outer")
      .groupBy("event_id")
      .agg(count(col("ceus")).as("n"), coalesce(min(col("eus") - col("ceus")), lit(-1L)).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val bucketed = EventQueries.q93.build(spark, sf0001)
      .select("event_id", "n_clicks", "min_gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(bucketed.toSeq == naive.toSeq)
    assert(naive.exists(_._2 > 0), "fixture must produce at least one match")
  }
}
