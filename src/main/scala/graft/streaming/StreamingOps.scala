package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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

  /** one (doc, band) hit flowing into the stateful bucket op. */
  final case class BandHit(docId: Long, bandIdx: Int, band: String)

  /** one emitted candidate: `canonicalId < docId` ⇔ this band bucket
    * already held an earlier document — a near-dup candidate edge. */
  final case class NearDupCandidate(docId: Long, bandIdx: Int, band: String,
                                    canonicalId: Long)

  /** Per-row MinHash LSH band keys — the SAME hash scheme as the batch
    * MinHash path (word-3-shingles; 8 hash functions = the 8-hex-char
    * slices of md5(shingle) and md5(shingle#); 4 bands of 2), but computed
    * in one JVM pass INSIDE the row instead of explode+hash-agg: a
    * streaming doc is one row, so the per-row fold is shuffle-free and
    * needs no streaming aggregation state. (The batch path deliberately
    * chooses explode+agg — see minhashSignatures in TextQueries — because
    * there the shuffle exists anyway and map-side combine wins; each shape
    * is right for its execution mode.)
    *
    * Plain Scala rather than Catalyst HOFs, deliberately: the streaming
    * path crosses the object boundary anyway (groupByKey), and the
    * interpreted transform/md5 lambda chain measured ~10 ms/doc single
    * core — worse still under posexplode, where InferFiltersFromGenerate
    * pushes a fully-inlined copy of the band tree into the scan filter.
    * This loop hashes each shingle twice and keeps 8 running minima;
    * `digest` is reused across rows via mapPartitions. Byte-for-byte
    * parity with the expression scheme (lowercase md5 hex, lexicographic
    * minima) is pinned by StreamingSpec's batch-parity assertions. */
  private val hexDigits = "0123456789abcdef".toCharArray

  def minhashBandsOf(digest: java.security.MessageDigest,
                     text: String): Array[String] = {
    def hex(d: Array[Byte]): String = {
      val cs = new Array[Char](d.length * 2)
      var i = 0
      while (i < d.length) {
        cs(2 * i) = hexDigits((d(i) >> 4) & 0xf)
        cs(2 * i + 1) = hexDigits(d(i) & 0xf)
        i += 1
      }
      new String(cs)
    }
    def md5Hex(s: String): String = {
      digest.reset()
      hex(digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    val toks = text.split(" ", -1)
    val shingles: Iterator[String] =
      if (toks.length >= 3)
        (1 to toks.length - 2).iterator.map(i =>
          toks(i - 1) + " " + toks(i) + " " + toks(i + 1))
      else Iterator.single(text)
    val mins = new Array[String](8) // 4 slices of md5(g), 4 of md5(g#)
    shingles.foreach { g =>
      val a = md5Hex(g)
      val b = md5Hex(g + "#")
      var h = 0
      while (h < 4) {
        val sa = a.substring(8 * h, 8 * h + 8)
        if (mins(h) == null || sa < mins(h)) mins(h) = sa
        val sb = b.substring(8 * h, 8 * h + 8)
        if (mins(h + 4) == null || sb < mins(h + 4)) mins(h + 4) = sb
        h += 1
      }
    }
    // band b pairs hash 2b with 2b+1 in the (a0..a3, b0..b3) order the
    // expression scheme uses: hashes 0-3 from md5(g), 4-7 from md5(g#)
    Array.tabulate(4)(b => md5Hex(mins(2 * b) + mins(2 * b + 1)))
  }

  /** band-bucket state: canonical (minimum) doc id + the processing-time
    * of the last hit, for the optional recency TTL. */
  final case class BucketState(minId: Long, lastMs: Long)

  /** Streaming near-dedup (X2's streaming twin): dedup NEW documents
    * against the history seen so far. Each doc fans out to its 4
    * LSH band buckets; a `flatMapGroupsWithState` keyed on the bucket
    * keeps the minimum doc id ever seen there and emits each hit with
    * that bucket's canonical id — `canonicalId < docId` marks a near-dup
    * candidate, exactly the batch band-join's edge relation, but
    * incremental.
    *
    * Scale/state posture: state is one tiny record per DISTINCT band
    * bucket — O(corpus) with `ttlMs = None`, like any dedup-against-ALL-
    * history must be; at 100 TB that state lives in the RocksDB state
    * store. `ttlMs = Some(t)` bounds it to recently-seen buckets (the
    * watermark analog of dropDuplicatesWithinWatermark): a bucket idle
    * longer than `t` of processing time is dropped via
    * ProcessingTimeTimeout, and a later re-arrival re-establishes the
    * bucket fresh (becomes its own canonical). Staleness is ALSO checked
    * against the stored last-hit time when new data arrives, so expiry
    * does not depend on an intermediate micro-batch having run the
    * timeout cleanup. Within a micro-batch, hits are processed in doc-id
    * order so results are batch-boundary-invariant. Works identically on
    * a batch frame (empty initial state; a batch job is one processing
    * instant, so a TTL never expires mid-batch) — the spec pins
    * streaming-vs-batch parity. */
  /** one tagged row flowing into [[asofStream]]: side 0 = right (the
    * version stream supplying matches), side 1 = left (the probe stream
    * being enriched). `tb` totally orders rows within (key, ts); `pid`/
    * `pval` are the right payload (ignored on left rows). */
  final case class AsOfEvent(key: Long, ts: Long, tb: Long, side: Int,
                             pid: Long, pval: Double)

  /** one retained right-version: everything a future left row needs. */
  final case class AsOfVersion(ts: Long, tb: Long, pid: Long, pval: Double)

  /** per-key state: versions DESCENDING by (ts, tb), pruned to the
    * tolerance horizon behind the newest version seen. Descending order
    * makes the common case O(1): an in-order arrival prepends at the
    * head, a probe's best match is the first qualifying element from the
    * head, and horizon pruning is a takeWhile — the previous
    * sort-per-insert was O(v log v) per version and measurably dragged
    * the sf10 feed (deep per-key version history). */
  final case class AsOfKeyState(versions: List[AsOfVersion])

  /** one enriched left row; `matched=false` carries zero/sentinel fields
    * (the q58 sentinel posture — no nullable columns). */
  final case class AsOfMatchOut(key: Long, ts: Long, tb: Long,
                                matched: Boolean, matchPid: Long,
                                matchTs: Long, matchVal: Double)

  /** Streaming backward as-of join (X21's streaming twin; the Flink
    * "temporal table join" shape): left rows match the latest right
    * version at-or-before their event time, within `toleranceMs` — the
    * incremental form of `operators/AsOfJoin.backward` with
    * `tolerance = toleranceMs`, which the spec pins batch-parity against.
    *
    * State posture (100 TB): per key, ONLY the right versions inside the
    * tolerance window behind the newest version survive — pruning is
    * correct (not lossy) because a version more than `toleranceMs` older
    * than any future left row's match horizon could only produce a miss
    * anyway. State per key is O(right-rate × tolerance), the same bound a
    * Flink interval join holds; key-level expiry for dead keys composes
    * the [[nearDupCandidates]] ProcessingTimeTimeout pattern if needed.
    *
    * Ordering contract: rows are processed in (ts, side, tb) order WITHIN
    * a micro-batch (side 0 first at equal ts ⇒ inclusive boundary, the
    * batch operator's default), so results are batch-boundary-invariant
    * for streams fed in event-time order. A right version arriving AFTER
    * a left row it should have matched (cross-batch disorder) is missed —
    * "enrich against history seen so far", the same incremental contract
    * [[nearDupCandidates]] declares; buffering lefts under a watermark is
    * the exactness upgrade and costs a second state store. */
  def asofStream(tagged: Dataset[AsOfEvent],
                 toleranceMs: Long): Dataset[AsOfMatchOut] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfKeyState, AsOfMatchOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var versions = state.getOption.map(_.versions).getOrElse(Nil)
        val out = List.newBuilder[AsOfMatchOut]
        rows.toSeq.sortBy(e => (e.ts, e.side, e.tb)).foreach { e =>
          if (e.side == 0) {
            val v = AsOfVersion(e.ts, e.tb, e.pid, e.pval)
            def newerThan(a: AsOfVersion, b: AsOfVersion): Boolean =
              a.ts > b.ts || (a.ts == b.ts && a.tb > b.tb)
            versions = versions match {
              case Nil => List(v)
              case h :: _ if !newerThan(h, v) =>
                // in-order arrival (the sorted-batch common case): O(1)
                val horizon = v.ts - toleranceMs
                v :: versions.takeWhile(_.ts >= horizon)
              case h :: _ =>
                // cross-batch disorder: insert in place, keep descending
                val (newer, older) = versions.span(newerThan(_, v))
                val horizon = h.ts - toleranceMs
                (newer ::: v :: older).takeWhile(_.ts >= horizon)
            }
          } else {
            // descending: first qualifying element = max (ts, tb) match
            val best = versions.find(v => v.ts <= e.ts && e.ts - v.ts <= toleranceMs)
            out += (best match {
              case Some(b) =>
                AsOfMatchOut(key, e.ts, e.tb, matched = true, b.pid, b.ts, b.pval)
              case None =>
                AsOfMatchOut(key, e.ts, e.tb, matched = false, -1L, -1L, 0.0)
            })
          }
        }
        state.update(AsOfKeyState(versions))
        out.result().iterator
      }
  }

  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        ttlMs: Option[Long] = None): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hits = docs
      .select(col(idCol).cast("long").as("docId"), col(textCol).as("_text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else minhashBandsOf(digest, text).iterator.zipWithIndex
            .map { case (b, i) => BandHit(id, i, b) }
        }
      }
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    hits.groupByKey(h => s"${h.bandIdx}#${h.band}")
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append(), timeoutConf) { (_, rows, state) =>
        if (state.hasTimedOut) {
          // idle past the TTL and no new data this batch: drop the bucket
          state.remove()
          Iterator.empty
        } else {
          val nowMs = if (ttlMs.isDefined) state.getCurrentProcessingTimeMs() else 0L
          var cur = state.getOption match {
            case Some(s) if ttlMs.forall(t => nowMs - s.lastMs <= t) => s.minId
            case _ => Long.MaxValue // absent, or stale past the TTL
          }
          val out = rows.toSeq.sortBy(_.docId).map { h =>
            cur = math.min(cur, h.docId)
            NearDupCandidate(h.docId, h.bandIdx, h.band, cur)
          }
          state.update(BucketState(cur, nowMs))
          ttlMs.foreach(state.setTimeoutDuration)
          out.iterator
        }
      }
  }

  /** one decontamination verdict: a doc with its gram/shared-gram counts
    * (`nShared > 0` ⇔ contaminated). */
  final case class ContamVerdict(docId: Long, nGrams: Long, nShared: Long)

  /** Word n-gram md5 digests of one document — byte-parity with the batch
    * gram scheme (q77 / pipeline.Curation.gramHashes: split on single
    * spaces keeping empties, n-word windows joined by spaces, lowercase
    * md5 hex). Pinned by StreamingSpec's batch-parity assertion. */
  def gramHashesOf(digest: java.security.MessageDigest, text: String,
                   n: Int): Iterator[String] = {
    def md5Hex(s: String): String = {
      digest.reset()
      val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val cs = new Array[Char](d.length * 2)
      var i = 0
      while (i < d.length) {
        cs(2 * i) = hexDigits((d(i) >> 4) & 0xf)
        cs(2 * i + 1) = hexDigits(d(i) & 0xf)
        i += 1
      }
      new String(cs)
    }
    val toks = text.split(" ", -1)
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var o = 1
      while (o < n) { sb.append(' ').append(toks(i + o)); o += 1 }
      md5Hex(sb.toString)
    }
  }

  /** Ingest-time benchmark decontamination (X41's streaming twin): check
    * each ARRIVING document against a fixed benchmark gram-digest set —
    * [[graft.pipeline.Curation.benchmarkGramSet]] — broadcast to the
    * executors. STATELESS by design: no streaming aggregation, no state
    * store, so throughput is one JVM hash pass per doc and the operator
    * composes with any downstream sink mode. (The alternative — explode
    * grams into a stream-static join + windowed count — needs a watermark
    * and shuffles every gram; the benchmark side is an eval suite, which
    * is broadcast-sized by construction, so the broadcast shape wins at
    * any corpus scale: the UNBOUNDED side streams through map-only.) */
  def decontaminateStream(docs: DataFrame, idCol: String, textCol: String,
                          benchGrams: Set[String], n: Int = 13): Dataset[ContamVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchGrams)
    docs.select(col(idCol).cast("long").as("docId"), col(textCol).as("_text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        val bench = bc.value
        rows.map { case (id, text) =>
          var nGrams = 0L
          var nShared = 0L
          val seen = new java.util.HashSet[String]()
          if (text != null) gramHashesOf(digest, text, n).foreach { gh =>
            if (seen.add(gh)) {
              nGrams += 1
              if (bench.contains(gh)) nShared += 1
            }
          }
          ContamVerdict(id, nGrams, nShared)
        }
      }
  }

  /** one quality-classifier verdict for an arriving doc (X47's streaming
    * shape): integer logit (partition/batch-order exact), sigmoid score,
    * and the `logit < 0` gate flag. */
  final case class ScoreVerdict(docId: Long, logit: Long, score: Double,
                                flagged: Boolean)

  /** Ingest-time quality-classifier gate
    * ([[graft.pipeline.Curation.linearScore]]'s streaming twin): score
    * each ARRIVING document against a fixed (term → integer weight)
    * linear model broadcast to the executors. STATELESS like
    * [[decontaminateStream]] — no aggregation state, one JVM pass per
    * doc, composes with any sink mode; the model side is
    * vocabulary-sized by construction (the caller materializes it via
    * [[graft.pipeline.Curation.weightsMap]], which asserts the bound).
    * Arithmetic parity with the batch shape is exact: same ` `-split
    * keeping empties, same integer weight sum (associative — batch
    * partition order and stream arrival order cannot diverge), same
    * IEEE sigmoid expression. Pinned by StreamingSpec. */
  def scoreStream(docs: DataFrame, idCol: String, textCol: String,
                  weights: Map[String, Long],
                  scale: Double = 16.0): Dataset[ScoreVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(weights)
    docs.select(col(idCol).cast("long").as("docId"), col(textCol).as("_text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val w = bc.value
        rows.map { case (id, text) =>
          var logit = 0L
          if (text != null) {
            val terms = text.split(" ", -1)
            var i = 0
            while (i < terms.length) {
              logit += w.getOrElse(terms(i), 0L)
              i += 1
            }
          }
          // StrictMath, not Math: Spark's Exp codegen is StrictMath.exp,
          // and Math.exp's x86 intrinsic differs by 1 ulp on some inputs
          // (caught by the batch-parity spec at logit 6 / scale 16)
          val score = 1.0 / (1.0 + StrictMath.exp(-(logit.toDouble / scale)))
          ScoreVerdict(id, logit, score, logit < 0)
        }
      }
  }

  /** Stream-stream enrichment join (the events-enrichment shape a feeds
    * pipeline hits: impressions ⋈ clicks, docs ⋈ annotations): equi-join
    * on `keyOn` plus an EVENT-TIME interval — right rows match left rows
    * whose timestamp is within [-lowerMs, +upperMs] of theirs. Both sides
    * carry a watermark and the range condition binds the two event-time
    * columns directly, which is exactly what Spark's stream-stream join
    * needs to derive a state watermark: buffered rows older than
    * (watermark − interval bound) are EVICTED, so state is
    * O(rate × (watermark + interval)) per side — bounded on an unbounded
    * stream — instead of joining against all history.
    *
    * `joinType` supports "inner" and "leftOuter" (the outer side emits
    * its null-padded row only once the watermark proves no match can
    * still arrive — late-emission, not wrong-emission). Column names must
    * be disjoint across the two sides except the join key; the caller
    * picks distinct ts column names (the usual `l_ts`/`r_ts` discipline)
    * because BOTH appear in the output.
    *
    * Works identically on batch frames (watermarks are no-ops there), so
    * the spec pins streaming == batch join on the same data. */
  def enrichStream(left: DataFrame, leftTs: String, leftWatermark: String,
                   right: DataFrame, rightTs: String, rightWatermark: String,
                   keyOn: Column, lowerMs: Long, upperMs: Long,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark)
    val r = right.withWatermark(rightTs, rightWatermark)
    val range =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperMs MILLISECONDS")
    l.join(r, keyOn && range, joinType)
  }

  /** Streaming count-min counter maintenance
    * ([[graft.operators.CountMinSketch]] as a streaming aggregation): the
    * running d×w counter matrix of `termCol` occurrences in an unbounded
    * stream, in Complete/Update output mode. The state IS the sketch —
    * d·w rows regardless of stream length (the whole point of a sketch as
    * streaming state: bounded memory with no watermark/eviction needed),
    * and because counters are sums of engine-replayable buckets, the
    * streaming matrix equals the batch [[graft.operators.CountMinSketch.counters]]
    * of the same prefix EXACTLY — parity pinned by StreamingSpec. */
  def cmsStream(terms: DataFrame, termCol: String, d: Int, w: Int): DataFrame = {
    import graft.operators.CountMinSketch
    terms
      .withColumn("row", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket",
        (0 until d).foldLeft(lit(-1)) { (acc, j) =>
          when(col("row") === j, CountMinSketch.bucket(col(termCol), j, w))
            .otherwise(acc)
        })
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
  }

  final case class FunnelEvent(user: Long, typ: String, eus: Long, tb: Long)
  final case class FunnelStep(user: Long, step: Int, eus: Long, gapUs: Long)

  /** Streaming twin of q97's ordered funnel — a per-user CEP state
    * machine (the MATCH_RECOGNIZE shape Spark lacks as a built-in):
    * first view arms step 1, a click strictly after it within
    * `windowUs` arms step 2, a purchase strictly after THAT within
    * `windowUs` completes step 3; each arming emits a step event with
    * its gap. State is three timestamps per user, O(1).
    *
    * For in-order feeds (the [[asofStream]] event-time contract) the
    * armed times are exactly q97's per-step minima — batch parity
    * pinned by StreamingSpec on real events. Late data follows the
    * incremental contract: already-armed steps never re-arm (the
    * history-so-far answer stands). */
  def funnelStream(events: Dataset[FunnelEvent],
                   windowUs: Long): Dataset[FunnelStep] =
    cepStream(events, Seq("view", "click", "purchase"), windowUs)

  /** Generalized CEP step-sequence matcher (r11, verdict item 5 — the
    * MATCH_RECOGNIZE shape Spark lacks as a built-in, with the step
    * list DECLARED instead of hard-coded): per user, an event of type
    * `steps(i)` arms step i+1 when step i is already armed, strictly
    * after it, and within `windowUs` of it (step 1 arms on first
    * occurrence); each arming emits a step event with its gap. State is
    * one timestamp per declared step, O(|steps|) per user.
    *
    * [[funnelStream]] is `cepStream(view→click→purchase)` — its q97
    * batch parity pin carries over verbatim; a real funnel user edits
    * the step list weekly, which is why it is a parameter. For in-order
    * feeds the armed times are the per-step minima of the step-ordered
    * first-match chain; late data follows the incremental contract
    * (already-armed steps never re-arm).
    *
    * State is keyed BY STEP NAME (`Map[step → armed-µs]`, ADVICE r11),
    * not by position, precisely so those weekly step-list edits compose
    * with a restored checkpoint: a surviving step keeps its armed time,
    * an inserted/renamed step starts unarmed, a removed step's entry is
    * dropped on the next update — never a positional misalignment or an
    * index-out-of-bounds from a grown list. (The Seq[Long]→Map state
    * ENCODING change itself requires one fresh checkpoint when
    * upgrading across r12.) */
  def cepStream(events: Dataset[FunnelEvent], steps: Seq[String],
                windowUs: Long): Dataset[FunnelStep] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepOf = steps.zipWithIndex.toMap
    val n = steps.size
    events.groupByKey(_.user)
      .flatMapGroupsWithState[Map[String, Long], FunnelStep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (u, rows, state) =>
        val saved = state.getOption.getOrElse(Map.empty[String, Long])
        val armed = Array.tabulate(n)(i => saved.getOrElse(steps(i), -1L))
        val out = List.newBuilder[FunnelStep]
        rows.toSeq.sortBy(e => (e.eus, e.tb)).foreach { e =>
          stepOf.get(e.typ).foreach { i =>
            val prevOk = i == 0 ||
              (armed(i - 1) >= 0 && e.eus > armed(i - 1) &&
                e.eus - armed(i - 1) <= windowUs)
            if (armed(i) < 0 && prevOk) {
              armed(i) = e.eus
              out += FunnelStep(u, i + 1, e.eus,
                if (i == 0) 0L else e.eus - armed(i - 1))
            }
          }
        }
        state.update(steps.zipWithIndex.collect {
          case (st, i) if armed(i) >= 0 => st -> armed(i)
        }.toMap)
        out.result().iterator
      }
  }

  final case class WauEvent(day: Long, hv: Long)
  final case class WauState(day: Long, kmins: Seq[Long], estimate: Double)

  /** Streaming maintainer of q99's per-day KMV distinct states — the
    * ingest half of the pre-aggregated sketch store: each micro-batch
    * folds its (day, user-hash) stream into the day's bounded k-min
    * array (O(64) longs per day, the SAME `KmvSketch.insert` law as the
    * batch aggregator, so the live state is bit-equal to a batch
    * rebuild over the prefix — StreamingSpec pins it) and emits the
    * refreshed state + estimate. Persist the snapshots and any trailing
    * window's WAU is a ≤window-length merge away (q99's closure
    * property), with no raw-event rescan ever. */
  def wauStream(events: Dataset[WauEvent]): Dataset[WauState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.day)
      .mapGroupsWithState[Array[Long], WauState](
        GroupStateTimeout.NoTimeout) { (day, rows, state) =>
        var b = state.getOption.getOrElse(Array.emptyLongArray)
        rows.foreach(e => b = graft.operators.KmvSketch.insert(b, e.hv))
        state.update(b)
        WauState(day, b.toSeq, graft.operators.KmvSketch.estimateOf(b))
      }
  }

  final case class TopKEvent(group: Long, packed: Long)
  final case class TopKSnapshot(group: Long, topk: Seq[Long])

  /** Streaming twin of [[graft.operators.TopK]]: per group, a bounded
    * sorted bottom-k of caller-packed sort keys maintained across
    * micro-batches — the live-leaderboard shape (top error codes this
    * hour, hottest documents so far). O(k) state per group; every batch
    * that touches a group emits its refreshed snapshot (Update mode).
    *
    * Parity is by construction: insertion applies the SAME
    * `TopK.insert` law as the batch Aggregator, so the snapshot after
    * any stream prefix is bit-equal to `TopK.bottomK` over that prefix
    * regardless of arrival order (StreamingSpec pins it). */
  def topkStream(events: Dataset[TopKEvent], k: Int): Dataset[TopKSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group)
      .mapGroupsWithState[Array[Long], TopKSnapshot](
        GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        var b = state.getOption.getOrElse(Array.emptyLongArray)
        rows.foreach(e => b = graft.operators.TopK.insert(b, e.packed, k))
        state.update(b)
        TopKSnapshot(g, b.toSeq)
      }
  }

  final case class RollingEvent(key: Long, ts: Long, tb: Long, cents: Long)
  final case class RollingState(window: List[(Long, Long, Long)]) // (ts, tb, cents) desc
  final case class RollingOut(key: Long, ts: Long, tb: Long, n: Long, cents: Long)

  /** Streaming twin of q96's rolling event-time features: per key, each
    * event emits the count and exact-cents sum of the key's events in the
    * trailing `windowMs` (inclusive, current row included) — the
    * feature-store "serve the rolling feature AT the event" shape.
    *
    * State per key is the trailing-window rows only (evicted as the
    * window slides — O(rate × window), the [[asofStream]] bound);
    * processed in (ts, tb) order within a micro-batch so results equal
    * the batch RANGE-frame window for in-order streams. Cross-batch
    * disorder inserts in place, so a late row still lands in its
    * neighbors' windows if those neighbors arrive later; rows emitted
    * BEFORE a late arrival keep their enrich-against-history-so-far
    * values (the [[asofStream]] incremental contract).
    *
    * Batch-parity caveat the spec pins: the batch RANGE frame treats
    * equal-ts rows as peers (each sees all), while the stream sees them
    * in (ts, tb) order — so parity holds on ts-distinct keys, and the
    * tie case is declared, not accidental. */
  def rollingStream(events: Dataset[RollingEvent],
                    windowMs: Long): Dataset[RollingOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RollingState, RollingOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var win = state.getOption.map(_.window).getOrElse(Nil)
        val out = List.newBuilder[RollingOut]
        rows.toSeq.sortBy(e => (e.ts, e.tb)).foreach { e =>
          val horizon = e.ts - windowMs
          def newer(a: (Long, Long, Long)): Boolean =
            a._1 > e.ts || (a._1 == e.ts && a._2 > e.tb)
          win = (win match {
            case h :: _ if newer(h) =>
              // cross-batch disorder: insert in place, keep descending
              val (n, o) = win.span(newer)
              n ::: (e.ts, e.tb, e.cents) :: o
            case _ =>
              // in-order arrival (the sorted-batch common case): O(1)
              (e.ts, e.tb, e.cents) :: win
          }).takeWhile(_._1 >= horizon)
          // peers-inclusive would need look-ahead; stream semantics are
          // "window as of arrival in (ts, tb) order" — scaladoc contract
          val inWin = win.filter { case (ts, tb, _) =>
            ts < e.ts || (ts == e.ts && tb <= e.tb)
          }
          out += RollingOut(key, e.ts, e.tb,
            inWin.size.toLong, inWin.map(_._3).sum)
        }
        state.update(RollingState(win))
        out.result().iterator
      }
  }

  final case class LedgerEvent(user: Long, es: Long, eventId: Long, delta: Long)
  final case class LedgerState(user: Long, bal: Long, peak: Long, nApplied: Long)

  /** Streaming twin of q120's clamped running balance: per user, the
    * prepaid-ledger recurrence b = max(0, b + δ) maintained live across
    * micro-batches, emitting the refreshed (balance, peak) snapshot
    * whenever a batch touches the user (Update mode).
    *
    * State is O(1) per user — two longs — because the recurrence only
    * needs the last balance; contrast q120's batch side, which gets the
    * same answer from a closed-form window identity. Rows are applied
    * in (es, eventId) order WITHIN a micro-batch; the recurrence is
    * order-dependent, so cross-batch parity assumes per-key in-order
    * arrival (a payments feed's normal contract — same posture as
    * [[rollingStream]]'s declared tie caveat). StreamingSpec pins
    * snapshot-after-any-prefix == the batch recurrence over that prefix
    * for the in-order feed. */
  def balanceStream(events: Dataset[LedgerEvent]): Dataset[LedgerState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .mapGroupsWithState[Array[Long], LedgerState](
        GroupStateTimeout.NoTimeout) { (u, rows, state) =>
        val st = state.getOption.getOrElse(Array(0L, 0L, 0L))
        var bal = st(0); var peak = st(1); var n = st(2)
        rows.toSeq.sortBy(e => (e.es, e.eventId)).foreach { e =>
          bal = math.max(0L, bal + e.delta)
          peak = math.max(peak, bal)
          n += 1
        }
        state.update(Array(bal, peak, n))
        LedgerState(u, bal, peak, n)
      }
  }
}
