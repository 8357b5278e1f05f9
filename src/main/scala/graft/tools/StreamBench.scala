package graft.tools

import graft.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-path throughput: drives the two stateful operators
  * (asofStream temporal join, nearDupCandidates band-bucket dedup)
  * through the real micro-batch engine (MemoryStream → memory sink) over
  * the testdata and reports sustained rows/s — BASELINE.md's streaming
  * numbers come from here; StreamingSpec pins correctness, this pins
  * cost.
  *
  * Feed is chunked (default 8 chunks) so state carries across multiple
  * micro-batches like production; wall time covers source-to-sink
  * including state-store commits. Rates are single-box local[32] —
  * cluster deployments shard by the group key.
  *
  * Usage: runMain graft.tools.StreamBench <sfDir> [chunks] [ops-csv]
  * (ops-csv ⊆ asof,neardup,exactdedup,enrich,rolling,topk,wau,funnel,balance — default all)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val ops: Set[String] = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("asof", "neardup", "exactdedup", "enrich", "rolling", "topk", "wau", "funnel", "balance"))
    val spark = graft.Session.local(appName = "graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    // the fuzz-hardened checkpoint posture from SparkSpec: checksummed
    // checkpoint writers deadlock under rapid micro-batches (Spark 4.1)
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // GRAFT_STATE_STORE=rocksdb switches from the default HDFS-backed
    // store (full in-memory map + snapshot per commit) to RocksDB — the
    // production setting once state outgrows executor heap
    if (sys.env.get("GRAFT_STATE_STORE").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // GRAFT_ROCKSDB_CHANGELOG=1: per-commit incremental changelog upload
    // instead of the default FULL RocksDB snapshot per commit — the knob
    // the r8 near-dedup regression implicated (2M tiny band-bucket keys
    // make each full snapshot corpus-sized while the per-batch delta is
    // batch-sized)
    if (sys.env.get("GRAFT_ROCKSDB_CHANGELOG").contains("1"))
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // ---- as-of join over events (clicks = versions, errors = probes)
    if (ops("asof")) {
    val tagged = Tables.events(spark, sfDir)
      .withColumn("eus", unix_micros(col("ts")))
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id").as("key"), col("eus").as("ts"),
        col("event_id").as("tb"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        when(col("event_type") === "click", col("event_id")).otherwise(0L).as("pid"),
        when(col("event_type") === "click", col("value")).otherwise(0.0).as("pval"))
      .as[StreamingOps.AsOfEvent]
      .orderBy("ts") // event-time feed order, the op's streaming contract
      .collect()
    timeIt("asof", tagged.length, chunks) {
      val in = MemoryStream[StreamingOps.AsOfEvent]
      val q = StreamingOps.asofStream(in.toDS(), toleranceMs = 3600L * 1000000L)
        .writeStream.format("memory").queryName("sb_asof")
        .outputMode(OutputMode.Append()).start()
      tagged.grouped(math.max(1, tagged.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }

    // ---- near-dup band-bucket dedup over documents
    if (ops("neardup")) {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .orderBy("doc_id").collect()
    timeIt("neardup", docs.length, chunks) {
      val in = MemoryStream[(Long, String)]
      // a MemoryStream chunk is ONE input partition; real sources (Kafka)
      // are partitioned, so spread the per-doc minhash across cores the
      // way a production feed would arrive
      val q = StreamingOps.nearDupCandidates(
        in.toDF().repartition(32).toDF("doc_id", "text"), "doc_id", "text")
        .writeStream.format("memory").queryName("sb_neardup")
        .outputMode(OutputMode.Append()).start()
      docs.grouped(math.max(1, docs.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }

    // ---- exact dedup over documents (content-hash key; state bounded by
    // the watermark via dropDuplicatesWithinWatermark). Event time is a
    // synthetic monotone feed clock — documents carry none — so the
    // watermark advances exactly as a production ingest's would.
    if (ops("exactdedup")) {
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L).as("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .orderBy("doc_id").collect()
    timeIt("exactdedup", hashed.length, chunks) {
      val in = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = StreamingOps.dedupStream(
        in.toDF().repartition(32).toDF("doc_id", "h", "ts"),
        "ts", "1 hour", Seq("h"))
        .writeStream.format("memory").queryName("sb_exactdedup")
        .outputMode(OutputMode.Append()).start()
      hashed.grouped(math.max(1, hashed.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }
    // ---- stream-stream interval enrichment over events (views ⋈ clicks
    // per user within ±1 h): Spark's watermarked stream-stream join —
    // state bounded by watermark + interval on both sides
    if (ops("enrich")) {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"), col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .orderBy("ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val views = ev.filter(_._1 == "view").map(e => (e._2, e._3, e._4))
    val clicks = ev.filter(_._1 == "click").map(e => (e._2, e._3, e._4, e._5))
    timeIt("enrich", views.length + clicks.length, chunks) {
      val lIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val rIn = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val q = StreamingOps.enrichStream(
        lIn.toDF().repartition(32).toDF("key", "l_ts", "view_id"),
        "l_ts", "1 hour",
        rIn.toDF().repartition(32).toDF("r_key", "r_ts", "click_id", "click_value"),
        "r_ts", "1 hour",
        col("key") === col("r_key"),
        lowerMs = 3600L * 1000L, upperMs = 3600L * 1000L)
        .writeStream.format("memory").queryName("sb_enrich")
        .outputMode(OutputMode.Append()).start()
      val lStep = math.max(1, views.length / chunks)
      val rStep = math.max(1, clicks.length / chunks)
      views.grouped(lStep).zipAll(clicks.grouped(rStep), Array.empty[(Long, java.sql.Timestamp, Long)], Array.empty[(Long, java.sql.Timestamp, Long, Double)])
        .foreach { case (lc, rc) =>
          if (lc.nonEmpty) lIn.addData(lc.toSeq: _*)
          if (rc.nonEmpty) rIn.addData(rc.toSeq: _*)
          q.processAllAvailable()
        }
      q.stop()
    }
    }

    // ---- rolling trailing-window features per user (q96's streaming twin)
    if (ops("rolling")) {
    val tagged = Tables.events(spark, sfDir)
      .withColumn("eus", unix_micros(col("ts")))
      .select(col("user_id").as("key"), col("eus").as("ts"),
        col("event_id").as("tb"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[StreamingOps.RollingEvent]
      .orderBy("ts").collect()
    timeIt("rolling", tagged.length, chunks) {
      val in = MemoryStream[StreamingOps.RollingEvent]
      val q = StreamingOps.rollingStream(in.toDS(), windowMs = 7L * 86400L * 1000000L)
        .writeStream.format("memory").queryName("sb_rolling")
        .outputMode(OutputMode.Append()).start()
      tagged.grouped(math.max(1, tagged.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }

    // ---- live top-k leaderboard per event type (q95's streaming twin)
    if (ops("topk")) {
    val typeCode = Map("click" -> 0L, "error" -> 1L, "purchase" -> 2L,
      "signup" -> 3L, "view" -> 4L)
    val packed = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map { r =>
        // (cents DESC, id ASC) packed so ascending-Long order is rank order
        val capped = math.min(r.getLong(2), (1L << 20) - 1)
        StreamingOps.TopKEvent(typeCode(r.getString(0)),
          ((1L << 20) - capped) << 40 | r.getLong(1))
      }
    timeIt("topk", packed.length, chunks) {
      val in = MemoryStream[StreamingOps.TopKEvent]
      val q = StreamingOps.topkStream(in.toDS(), k = 100)
        .writeStream.format("memory").queryName("sb_topk")
        .outputMode(OutputMode.Update()).start()
      packed.grouped(math.max(1, packed.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }

    // ---- per-day KMV distinct-state maintenance (q99's ingest half)
    if (ops("wau")) {
    val feed = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
        graft.util.Det.hex60(md5(col("user_id").cast("string"))).as("hv"))
      .as[StreamingOps.WauEvent].collect()
    timeIt("wau", feed.length, chunks) {
      val in = MemoryStream[StreamingOps.WauEvent]
      val q = StreamingOps.wauStream(in.toDS())
        .writeStream.format("memory").queryName("sb_wau")
        .outputMode(OutputMode.Update()).start()
      feed.grouped(math.max(1, feed.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }

    // ---- funnel state machine (q97's CEP twin)
    if (ops("funnel")) {
    val feed = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").as("user"), col("event_type").as("typ"),
        unix_micros(col("ts")).as("eus"), col("event_id").as("tb"))
      .orderBy("eus", "tb")
      .as[StreamingOps.FunnelEvent].collect()
    timeIt("funnel", feed.length, chunks) {
      val in = MemoryStream[StreamingOps.FunnelEvent]
      val q = StreamingOps.funnelStream(in.toDS(), 86400L * 1000000L)
        .writeStream.format("memory").queryName("sb_funnel")
        .outputMode(OutputMode.Append()).start()
      feed.grouped(math.max(1, feed.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }
    // ---- clamped-ledger balance maintainer (q120's stateful twin)
    if (ops("balance")) {
    val feed = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id").as("user"),
        unix_timestamp(col("ts")).as("es"), col("event_id").as("eventId"),
        when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long"))
          .otherwise(-round(col("value") * 100, 0).cast("long")).as("delta"))
      .orderBy("es", "eventId")
      .as[StreamingOps.LedgerEvent].collect()
    timeIt("balance", feed.length, chunks) {
      val in = MemoryStream[StreamingOps.LedgerEvent]
      val q = StreamingOps.balanceStream(in.toDS())
        .writeStream.format("memory").queryName("sb_balance")
        .outputMode(OutputMode.Update()).start()
      feed.grouped(math.max(1, feed.length / chunks)).foreach { c =>
        in.addData(c.toSeq: _*); q.processAllAvailable()
      }
      q.stop()
    }
    }
    spark.stop()
  }

  /** times the full source-to-sink drive and prints one JSON line. */
  private def timeIt(op: String, n: Int, chunks: Int)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    body
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"stream_throughput","op":"$op%s","rows":$n%d,"chunks":$chunks%d,"wall_sec":$wall%.2f,"rows_per_sec":${n / wall}%.0f}""")
  }
}
