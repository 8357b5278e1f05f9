package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.11): the reference has no
  * streaming; the engine declares event-time windowing + sessionization +
  * watermark late-data policy for the `events` extension. These wrappers
  * work on both batch and streaming DataFrames — the batch twins are
  * hash-checked by Q24a-c; the streaming behavior (watermark discards,
  * session merge across micro-batches) is unit-tested with a MemoryStream
  * (StreamingSpec).
  */
object StreamingOps {

  /** Tumbling event-time window counts/sums with a watermark. */
  def tumbling(events: DataFrame, tsCol: String, watermark: String,
               width: String, aggs: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window. */
  def sliding(events: DataFrame, tsCol: String, watermark: String,
              width: String, slide: String, aggs: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with a gap timeout — Spark-native session_window
    * (stateful merge across micro-batches under a watermark). */
  def sessions(events: DataFrame, tsCol: String, keyCol: String,
               watermark: String, gap: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup (X1's streaming twin): keep the first record per
    * key, with state expiry bounded by the watermark —
    * `dropDuplicatesWithinWatermark` keeps state finite on an unbounded
    * stream (a plain dropDuplicates would grow state forever at 100 TB/day). */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
