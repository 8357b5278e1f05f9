package graft.pipeline

import graft.queries.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication as ONE pipeline (the production composition of the
  * declared stages, driven by `graft.Main dedup`): exact dedup by content
  * hash (q26's relation), MinHash→LSH→connected-components near-dup
  * clusters over the exact-canonical survivors (q39's relation), and
  * keep-best-quality selection per cluster (q50's relation).
  *
  * Unlike the declared queries — each standalone by oracle contract, so
  * q50 re-runs the whole q39 chain — this materializes each stage once:
  * the exact stage SHRINKS the corpus before the shingle explode pays for
  * it, and cluster labels feed selection directly. At 100 TB the exact
  * stage is the cheap first cut (hash-agg on md5), and everything after
  * runs on the smaller canonical set.
  *
  * Reference provenance: the reference has no dedup (its subjects are
  * unique by construction); this is the SURVEY §2.13 extension surface
  * composed end-to-end.
  */
object CorpusDedup {

  /** Incremental ingest (q72's relation as a pipeline API): judge
    * `incoming` documents against an `existing` corpus WITHOUT
    * re-clustering it — per-incoming verdict `exact_dup` / `near_dup` /
    * `novel` plus the lowest-id existing match (-1 when novel). The two
    * probe indices (content-hash → min id, LSH band → min id) are exactly
    * the frames a production ingest materializes once and appends to per
    * accepted shard; they are derived here so the API is self-contained —
    * a deployment passes cached copies instead. Cost per increment:
    * O(incoming) plus two co-partitioned hash joins; nothing broadcasts
    * (both indices are corpus-sized in the worst case). */
  def incremental(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val exh = existing
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("ex_id"))
    val exb = TextQueries.bandKeys(existing.select(col("doc_id"), col("text")))
      .groupBy("band_idx", "band").agg(min(col("doc_id")).as("ex_id"))
    val exactMatch = incoming
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .join(exh, "content_hash")
      .groupBy("doc_id").agg(min(col("ex_id")).as("exact_id"))
    val nearMatch = TextQueries.bandKeys(incoming.select(col("doc_id"), col("text")))
      .join(exb, Seq("band_idx", "band"))
      .groupBy("doc_id").agg(min(col("ex_id")).as("near_id"))
    incoming.select("doc_id")
      .join(exactMatch, Seq("doc_id"), "left")
      .join(nearMatch, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, "exact_dup")
          .when(col("near_id").isNotNull, "near_dup")
          .otherwise("novel").as("verdict"),
        coalesce(col("exact_id"), col("near_id"), lit(-1L)).cast("long").as("match_id"))
  }

  /** Materialized near-dup dedup state — the two tables a production
    * ingest keeps current between shards: `labels(doc_id, cluster_id)`
    * (the q39 fixpoint over every corpus doc: cluster_id = min doc_id
    * reachable through shared LSH bands) and
    * `bandIndex(band_idx, band, ex_id)` (one row per occupied LSH
    * bucket, ex_id = the bucket's minimum doc_id — the probe index
    * [[incremental]] joins against). Both are plain DataFrames so a
    * deployment can serve them from parquet/snapshot tables.
    * [[release]] unpersists what [[indexCorpus]] pinned for its own
    * two-reader band frame — call it after materializing both tables
    * (ADVICE r14: a long-lived session otherwise leaks one corpus-sized
    * cache per state build; labels stay valid — they are
    * checkpoint-backed — and bandIndex recomputes from source if
    * re-read). */
  final case class DedupState(labels: DataFrame, bandIndex: DataFrame,
                              pinned: Seq[DataFrame] = Nil) {
    def release(): Unit = pinned.foreach(_.unpersist())
  }

  /** What [[appendShard]] hands back: the merged state, the UPSERT-ready
    * subsets (`changedLabels` = every shard doc's new row plus every
    * existing row whose cluster_id moved; `changedIndex` = the band
    * buckets the shard created or whose min id improved — exactly the
    * rows a scoped [[Snapshots.upsert]] MERGE writes; untouched
    * components and buckets never leave their files), and the CC round
    * count over the quotient graph (diagnostics). */
  final case class ShardDelta(state: DedupState, changedLabels: DataFrame,
                              changedIndex: DataFrame, rounds: Int,
                              pinned: Seq[DataFrame] = Nil) {
    /** Unpersist the frames [[appendShard]] pinned for its own
      * multi-reference subtrees. Call AFTER materializing what you need
      * from the delta (writes/upserts/collects) — a long-lived session
      * appending daily shards would otherwise accumulate one shard's
      * worth of cached band/probe frames per append (r14 review). The
      * returned frames stay valid: labels are checkpoint-backed and the
      * rest recompute from source if re-read. */
    def release(): Unit = pinned.foreach(_.unpersist())
  }

  /** Full state build over a corpus — the cold path a deployment runs
    * once, then maintains with [[appendShard]]. ONE shingle→minhash→band
    * pass feeds BOTH state tables (r14 review: deriving them
    * independently re-shingled the corpus for each): the labels come out
    * checkpoint-backed (self-contained), the band index is one agg over
    * the cached band frame — which stays pinned until the caller
    * materializes the index and calls [[DedupState.release]] (the CLI
    * verb does; the bench harness clears caches between cells). */
  def indexCorpus(docs: DataFrame): DedupState = {
    val dd = docs.select(col("doc_id"), col("text"))
    val bands = TextQueries.bandKeys(dd).persist()
    val labels = TextQueries.nearDupClustersOfBands(dd.select("doc_id"), bands)
    val idx = bands.groupBy("band_idx", "band").agg(min(col("doc_id")).as("ex_id"))
    DedupState(labels, idx, pinned = Seq(bands))
  }

  /** Order-invariant content identity of a shard — the `txnAppId` of the
    * dedup-append transaction (VERDICT r14 item 2): md5 over (sum, xor,
    * count) of per-row SHA-256-derived values, so the same shard content
    * yields the same token whatever its path, file layout, or
    * partitioning — which is what lets a crashed `dedupappend` be
    * recognized on replay and resumed instead of forcing an O(corpus)
    * rebuild. One O(shard) scan.
    *
    * Token-format versioning (ADVICE r16): the token WIDTH is the format
    * version — 24 hex = this SHA-256-derived format (r16+); 12 hex = the
    * legacy xxhash64-sum format retired in r16. A state left torn by a
    * pre-r16 writer can never be resumed by a current binary (the
    * recomputed token cannot match); both resume paths recognize a
    * 12-hex stamp token and direct to a `dedupindex` rebuild instead of
    * an endlessly-failing `--resume` retry. */
  def shardToken(shard: DataFrame): String = shardIdentity(shard)._2

  /** [[shardToken]] fused with the row count — ONE shard scan serves
    * both the txn identity and the empty-shard check / report line
    * (r15: the CLI verb and the streaming sink each paid a second scan
    * for the count). */
  def shardIdentity(shard: DataFrame): (Long, String) = {
    // ADVICE r15 hardening: corpus text is UNTRUSTED content, and a plain
    // SUM of non-cryptographic xxhash64 row values is invertible — rows
    // could be crafted so a different shard's token collides, letting
    // --resume/appendSink accept a wrong-shard replay. The per-row value
    // is now derived from SHA-256 of the row (preimage-resistant), the
    // order-invariant combination keeps THREE independent components a
    // forged shard would have to match simultaneously (decimal-exact sum,
    // bitwise xor, row count), and the token keeps 96 digest bits.
    val vHex = substring(sha2(concat_ws("\u0001",
      col("doc_id").cast("string"), col("text")), 256), 1, 15)
    val vNum = conv(vHex, 16, 10)
    val r = shard.agg(
      count(lit(1)),
      sum(vNum.cast("decimal(38,0)")).cast("string"),
      bit_xor(vNum.cast("long"))).head()
    val s = if (r.isNullAt(1)) "empty|0|0"
      else s"${r.getString(1)}|${r.getLong(2)}|${r.getLong(0)}"
    val token = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(24)
    (r.getLong(0), token)
  }

  /** The band-index MERGE payload ALONE, recomputed at O(shard) from an
    * UNCHANGED `bandIndex`: shard bucket minima that are new or improve
    * the existing bucket min — exactly [[appendShard]]'s `changedIndex`
    * given the same inputs (same shardMins ⟕ touched-bucket join, same
    * filter). This is the torn-state recovery path: a crash BETWEEN the
    * labels MERGE and the bands MERGE leaves labels fully post-append
    * (the upsert is atomic per table) and bands untouched, so replaying
    * the second MERGE needs no CC and no label work — just this frame,
    * re-derived from the shard text and the still-old index. */
  def bandDelta(bandIndex: DataFrame, shard: DataFrame): DataFrame = {
    val shardMins = TextQueries.bandKeys(
        shard.select(col("doc_id"), col("text")))
      .groupBy("band_idx", "band").agg(min(col("doc_id")).as("ex_id"))
    val old = bandIndex
      .join(broadcast(shardMins.select("band_idx", "band")),
        Seq("band_idx", "band"))
      .select(col("band_idx"), col("band"), col("ex_id").as("_old"))
    shardMins.join(broadcast(old), Seq("band_idx", "band"), "left")
      .filter(col("_old").isNull || col("ex_id") < col("_old"))
      .select("band_idx", "band", "ex_id")
  }

  /** Incremental label maintenance (VERDICT r13 item 1): append `shard`
    * to a corpus whose [[DedupState]] is already materialized, producing
    * labels IDENTICAL to a full re-cluster of corpus ∪ shard — at
    * O(shard) cost, not O(corpus).
    *
    * The trick is running connected components on the QUOTIENT graph:
    *
    *   - vertices: shard doc ids ∪ the LABELS of existing components the
    *     shard touches. Every old member of an LSH bucket is connected
    *     to the bucket's min doc (the star edges cluster formation
    *     used), so one representative label stands for ALL old members
    *     of every bucket in that component — each old component enters
    *     the graph pre-collapsed to a single vertex. This is the
    *     maximal form of [[graft.operators.ConnectedComponents.minLabel]]'s
    *     warm start: instead of seeding touched docs with old labels
    *     and re-flooding them, the old fixpoint is USED as the vertex
    *     set, so CC work is O(shard + touched components), never
    *     O(touched docs).
    *   - edges: per LSH bucket the shard occupies, a star over
    *     {shard members} ∪ {the bucket's existing component label}.
    *     A full recompute's bucket star connects old ∪ new members
    *     directly; these edges generate the same connectivity because
    *     old members are already mutually connected through the old
    *     fixpoint (and assert nothing the full graph lacks).
    *
    * The quotient fixpoint's min per merged component =
    * min(old component minima ∪ shard ids in it) = the min doc id over
    * the merged component — exactly the full recompute's label, label
    * for label (spec-pinned, including shards that MERGE existing
    * components and shard ids smaller than an existing component's
    * min). Buckets untouched by the shard contribute no new
    * connectivity, so untouched components keep their labels verbatim.
    *
    * Scale/cost at 100 TB: the corpus-sized tables are only ever
    * STREAMED against broadcast probes — touched-rep lookup and label
    * composition are broadcast hash joins into scans of `labels`;
    * the index merge is a broadcast anti join into a scan of
    * `bandIndex`; nothing corpus-sized shuffles and no corpus text is
    * re-shingled. The shard side (bands, quotient graph, CC rounds) is
    * O(shard). Returned frames are lazy; [[ShardDelta.changedLabels]]
    * is the scoped-MERGE payload so the daily shard append rewrites
    * only the files holding moved labels.
    *
    * Contract: doc_ids unique across corpus ∪ shard (the
    * [[Snapshots.upsert]] key contract); `state` current for the
    * corpus. Reference shape: the cache skip/refresh posture
    * (`pipeline/dataset_cacher.py:67-76`) applied to dedup state.
    */
  def appendShard(state: DedupState, shard: DataFrame): ShardDelta = {
    val shardBands = TextQueries.bandKeys(
      shard.select(col("doc_id"), col("text"))).persist()
    val shardBuckets = shardBands.select("band_idx", "band").distinct()
    // shard-touched buckets that already exist: stream the (corpus-sized)
    // index against the broadcast shard buckets — scan, no shuffle
    val touched = state.bandIndex
      .join(broadcast(shardBuckets), Seq("band_idx", "band"))
      .persist()
    // labels of the touched bucket representatives, same broadcast-probe
    // shape against the labels scan
    val touchedReps = touched.select(col("ex_id").as("doc_id")).distinct()
    val repLabels = state.labels.join(broadcast(touchedReps), Seq("doc_id"))
      .select(col("doc_id").as("ex_id"), col("cluster_id").as("ex_lbl"))
      .persist()
    // quotient bucket members: shard docs plus (for pre-existing buckets)
    // the bucket's old component label; star edges to the bucket min —
    // the same linear-in-band-rows shape cluster formation uses
    val members = shardBands
      .select(col("band_idx"), col("band"), col("doc_id").as("id"))
      .unionByName(touched.join(repLabels, Seq("ex_id"))
        .select(col("band_idx"), col("band"), col("ex_lbl").as("id")))
    val edges = members
      .withColumn("rep", min(col("id")).over(
        Window.partitionBy(col("band_idx"), col("band"))))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("a"), col("id").as("c")).distinct()
    // persisted: minLabel's auto probe counts sym before the rounds scan
    // it — unpersisted, the count would re-execute the window+distinct
    // edge derivation once per append (r14 review)
    val sym = edges.select(col("a").as("x"), col("c").as("nb"))
      .unionByName(edges.select(col("c").as("x"), col("a").as("nb")))
      .persist()
    val verts = shard.select(col("doc_id").as("id"))
      .unionByName(repLabels.select(col("ex_lbl").as("id"))).distinct()
    val (quot, rounds) = graft.operators.ConnectedComponents.minLabel(
      verts, "id", sym, "x", "nb", "_qlbl")
    // label moves for existing components: old label L → quotient min.
    // Only touched components whose min actually changed are rewritten.
    val exMoves = quot
      .join(repLabels.select(col("ex_lbl").as("id")).distinct(), Seq("id"))
      .filter(col("_qlbl") =!= col("id"))
      .select(col("id").as("cluster_id"), col("_qlbl"))
    val movedExisting = state.labels.join(broadcast(exMoves), Seq("cluster_id"))
      .select(col("doc_id"), col("_qlbl").as("cluster_id"))
    val newExisting = state.labels
      .join(broadcast(exMoves), Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_qlbl"), col("cluster_id")).as("cluster_id"))
    // every shard doc is a quotient vertex; left+coalesce only guards
    // degenerate empty inputs
    val shardLabels = shard.select(col("doc_id"))
      .join(quot.select(col("id").as("doc_id"), col("_qlbl")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_qlbl"), col("doc_id")).as("cluster_id"))
    // band-index merge: shard bucket minima that are new or improve the
    // existing min, anti-joined (broadcast — the upsert set is
    // shard-sized) into the streamed old index
    val shardMins = shardBands.groupBy("band_idx", "band")
      .agg(min(col("doc_id")).as("ex_id"))
    val improved = shardMins
      .join(touched.select(col("band_idx"), col("band"),
        col("ex_id").as("_old")), Seq("band_idx", "band"), "left")
      .filter(col("_old").isNull || col("ex_id") < col("_old"))
      .select("band_idx", "band", "ex_id")
    val newIndex = state.bandIndex
      .join(broadcast(improved.select("band_idx", "band")),
        Seq("band_idx", "band"), "left_anti")
      .unionByName(improved)
    ShardDelta(
      DedupState(newExisting.unionByName(shardLabels), newIndex),
      movedExisting.unionByName(shardLabels), improved, rounds,
      pinned = Seq(shardBands, touched, repLabels, sym))
  }

  /** MERGE the band-index delta and stamp the guard meta, burning a
    * version even when the delta is empty (an upsert with zero changed
    * buckets burns no version, which would leave the stamp pointing at
    * the PREVIOUS labels version — the torn-state guard's one false
    * positive). Shared by the CLI verb, its `--resume` replay, and the
    * streaming sink. Returns (rows touched, final bands version). */
  private[graft] def mergeBandDelta(spark: org.apache.spark.sql.SparkSession,
                                    bandsTable: String, delta: DataFrame,
                                    stamp: String): (Long, Long) = {
    val ci = delta.withColumn("band_key",
      concat(col("band_idx").cast("string"), lit(":"), col("band")))
    val before = Snapshots.currentVersion(spark, bandsTable)
    val bv = Snapshots.upsert(spark, bandsTable, ci, "band_key", meta = stamp)
    val finalV =
      if (bv.version == before)
        Snapshots.commit(spark, ci.limit(0), bandsTable, meta = stamp).version
      else bv.version
    (bv.rowsUpdated + bv.rowsInserted, finalV)
  }

  /** Exactly-once STREAMING shard ingest (VERDICT r14 item 5): a
    * `foreachBatch` function keeping a `dedupindex` state current as
    * document shards arrive on a stream — [[appendShard]] composed with
    * the [[Snapshots.batchSink]] txn guard, so N micro-batches end
    * label-identical to one cold [[indexCorpus]] over the union
    * (StreamingSpec pins this), and a recovery replay of an
    * already-committed batch is a recognized no-op.
    *
    * Stamp protocol (one two-table transaction per batch):
    *   - labels MERGE meta: `dedupappend:<token>:batch:<appId>:<id>` —
    *     the shard's content token (crash identity) plus the batch
    *     watermark this appId has reached (replay skip guard).
    *   - bands MERGE meta: `dedupappend:<token>:labels_v<V>` — the
    *     torn-state pairing stamp the CLI guard already checks.
    *
    * Crash windows, all healed by Structured Streaming's replay of the
    * in-flight batch: before MERGE 1 → nothing landed, the replay runs
    * the full append; BETWEEN the MERGEs → the state is torn, the labels
    * head stamp carries this batch's token, and the replay applies only
    * the missing band-index MERGE ([[bandDelta]] — the same O(shard)
    * recovery `dedupappend --resume` runs); after MERGE 2 → the batch
    * watermark says done, the replay is a no-op. A torn state whose
    * token does NOT match the replayed batch refuses loudly (it was torn
    * by a different writer — the one-live-writer-per-table discipline
    * was broken; recover via the CLI with that shard).
    *
    * `appId` must be stable across restarts of the same query (the
    * batchSink contract). The state must exist (`dedupindex` first).
    *
    * r16 (VERDICT r15 item 7): the head version/stamp probe is CACHED in
    * the closure across batches. Under the one-live-writer-per-table
    * discipline this sink itself authored the head stamps after its
    * first batch, so re-listing the manifest log and re-reading both
    * meta files per batch (four fs round-trips whose listing cost grows
    * with the version count — O(batches²) cumulative) only re-derives
    * what the closure already knows; the state READS are pinned to the
    * cached versions too, saving the re-listing inside each read. The
    * cache is seeded from the log on the FIRST batch — a process-level
    * restart builds a fresh closure, so torn-state detection reads disk
    * truth exactly when a foreign writer's tear could have arrived;
    * afterwards it is updated from this sink's own upsert results. If a
    * caller reuses ONE closure across an in-JVM query restart, the
    * replayed batch re-derives its deltas from the cached pre-crash
    * versions and re-applies them — both MERGEs are idempotent by key at
    * pinned inputs, so the heads converge to the same state the fresh-
    * closure torn-heal path produces (StreamingSpec's torn-batch trials
    * pin the fresh-closure path). The txn stamps are unchanged. */
  def appendSink(stateDir: String, appId: String): (DataFrame, Long) => Unit = {
    // (labels version, labels meta, bands version, bands meta) at the
    // table heads; None until the first batch (or after a restart)
    var head: Option[(Long, String, Long, String)] = None
    // ADVICE r16: the cached head means torn-by-foreign-writer detection
    // only runs on a closure's FIRST batch — a long-lived sink would mask
    // an out-of-band CLI write (one-writer discipline broken) and keep
    // merging against stale pinned versions, silently dropping that
    // writer's rows from its view. Revalidate the cached bands version
    // against disk truth every REVALIDATE_EVERY batches: the cost is one
    // manifest listing per N batches (bounded, unlike the O(batches²)
    // per-batch re-listing the cache removed), and a foreign advance
    // fails LOUDLY within N batches instead of never.
    val RevalidateEvery = 16
    var sinceCheck = 0
    (df, batchId) =>
      require(!appId.contains(":"), s"appId must not contain ':': $appId")
      val spark = df.sparkSession
      val labelsT = s"$stateDir/labels"
      val bandsT = s"$stateDir/bands"
      // micro-batch frames are single-pass by contract; this one is read
      // several times (token, bands, quotient CC) — pin it for the batch
      val shard = df.select(col("doc_id"), col("text")).persist()
      try {
        val (nShard, token) = shardIdentity(shard)
        if (head.isDefined) {
          sinceCheck += 1
          if (sinceCheck >= RevalidateEvery) {
            sinceCheck = 0
            val diskB = Snapshots.currentVersion(spark, bandsT)
            val diskL = Snapshots.currentVersion(spark, labelsT)
            require(diskB == head.get._3 && diskL == head.get._1,
              s"dedup state advanced by a FOREIGN writer (disk labels_v$diskL/" +
                s"bands_v$diskB, this sink's cached labels_v${head.get._1}/" +
                s"bands_v${head.get._3}) — the one-live-writer-per-table " +
                "discipline was broken; stop the other writer and restart " +
                "this stream (the restart re-seeds from disk truth)")
          }
        }
        val (curLabelsV, labelsMeta, curBandsV, bandsMeta) = head.getOrElse {
          val lv = Snapshots.currentVersion(spark, labelsT)
          val bv = Snapshots.currentVersion(spark, bandsT)
          (lv, Snapshots.commitMeta(spark, labelsT, lv),
            bv, Snapshots.commitMeta(spark, bandsT, bv))
        }
        val tag = ":labels_v"
        val torn = (bandsMeta.startsWith("dedupappend:") ||
            bandsMeta.startsWith("dedupindex:")) && {
          require(bandsMeta.contains(tag),
            s"unparseable dedup state stamp '$bandsMeta' — rebuild with dedupindex")
          bandsMeta.substring(
            bandsMeta.lastIndexOf(tag) + tag.length).toLong != curLabelsV
        }
        val bTag = s":batch:$appId:"
        val lastBatch = if (labelsMeta.contains(bTag))
          labelsMeta.substring(
            labelsMeta.lastIndexOf(bTag) + bTag.length).toLong
        else -1L
        if (torn) {
          // legacy-token recognition mirrors the CLI verb (ADVICE r16):
          // a 12-hex token is the pre-r16 xxhash64 format no current
          // binary can reproduce — only a dedupindex rebuild recovers it
          val tornToken = labelsMeta.stripPrefix("dedupappend:").takeWhile(_ != ':')
          // ADVICE r17: legacy detection requires a well-formed
          // dedupappend meta AND a 12-HEX token (see Main's CLI twin)
          require(!(labelsMeta.startsWith("dedupappend:") &&
              tornToken.length == 12 &&
              // ASCII digits only, matching the CLI twin (ADVICE r18)
              tornToken.forall(c => (c >= '0' && c <= '9') || ('a' to 'f').contains(c))),
            s"torn state carries a LEGACY pre-r16 shard token '$tornToken' " +
              "(12-hex) — --resume can never match it; rebuild with dedupindex")
          require(labelsMeta.startsWith(s"dedupappend:$token:") ||
              labelsMeta == s"dedupappend:$token",
            s"dedup state torn by a different shard ('$labelsMeta', this " +
              s"batch 'dedupappend:$token') — recover it via " +
              "`dedupappend --resume` with that shard, then restart the stream")
          val bands = Snapshots.read(spark, bandsT, version = curBandsV)
            .select("band_idx", "band", "ex_id")
          val stamp = s"dedupappend:$token$tag$curLabelsV"
          val (_, bv) = mergeBandDelta(spark, bandsT, bandDelta(bands, shard), stamp)
          head = Some((curLabelsV, labelsMeta, bv, stamp))
        } else if (batchId > lastBatch && nShard > 0) {
          val state = DedupState(
            Snapshots.read(spark, labelsT, version = curLabelsV)
              .select("doc_id", "cluster_id"),
            Snapshots.read(spark, bandsT, version = curBandsV)
              .select("band_idx", "band", "ex_id"))
          val delta = appendShard(state, shard)
          val lMeta = s"dedupappend:$token$bTag$batchId"
          val lv = Snapshots.upsert(spark, labelsT, delta.changedLabels,
            "doc_id", meta = lMeta)
          val bStamp = s"dedupappend:$token$tag${lv.version}"
          val (_, bv) = mergeBandDelta(spark, bandsT, delta.changedIndex, bStamp)
          delta.release()
          head = Some((lv.version, lMeta, bv, bStamp))
        } else {
          // replayed/empty batch: heads untouched — cache what we read
          head = Some((curLabelsV, labelsMeta, curBandsV, bandsMeta))
        }
      } finally shard.unpersist()
  }

  /** Per-document dedup verdict over `docs(doc_id, text, …)`:
    * (doc_id, content_hash, exact_canonical_id, cluster_id, cluster_size,
    * quality_score, kept). `kept` ⇔ the doc survives exact dedup (is its
    * content's min-id canonical) AND is its near-dup cluster's
    * best-quality member (q50's rank rule: quality desc, doc_id asc).
    * Exact copies inherit their canonical's cluster columns with
    * kept=false, so the verdict covers every input row. */
  def keepBest(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("text"),
      md5(col("text")).as("content_hash"))
    val canon = hashed.groupBy("content_hash")
      .agg(min(col("doc_id")).as("exact_canonical_id"))
    val withCanon = hashed.join(canon, "content_hash")
    val survivors = withCanon
      .filter(col("doc_id") === col("exact_canonical_id"))
      .select("doc_id", "text")
    val labels = TextQueries.nearDupClustersOf(survivors)
    val quality = TextQueries.qualityFeaturesOf(survivors)
      .select(col("doc_id"), col("quality_score"))
    val wc = Window.partitionBy(col("cluster_id"))
    val selected = labels.join(quality, "doc_id")
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .withColumn("_rn", row_number().over(
        wc.orderBy(col("quality_score").desc, col("doc_id"))))
      .withColumn("_kept", col("_rn") === 1)
      .select(col("doc_id").as("exact_canonical_id"), col("cluster_id"),
        col("cluster_size"), col("quality_score"), col("_kept"))
    withCanon.select("doc_id", "content_hash", "exact_canonical_id")
      .join(selected, "exact_canonical_id")
      .withColumn("kept",
        col("_kept") && (col("doc_id") === col("exact_canonical_id")))
      .select("doc_id", "content_hash", "exact_canonical_id", "cluster_id",
        "cluster_size", "quality_score", "kept")
  }

  /** Duplication-profile report over an ALREADY-computed [[keepBest]]
    * verdict — q62's audit numbers for the composed pipeline, without
    * re-running the cluster chain (labels are materialized once here,
    * unlike the standalone-by-contract declared queries): one row per
    * cluster doc-count, with the tokens the full exact+near policy
    * removes and the corpus fraction that represents. `docs` re-supplies
    * text only for the size(split) token count. */
  def profile(verdict: DataFrame, docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val v = verdict.join(toks, "doc_id")
    val per = v.groupBy("cluster_id").agg(
      count(lit(1)).as("cluster_docs"),
      sum(col("n_tokens")).as("c_tokens"),
      sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("c_kept"))
    val tot = toks.agg(sum(col("n_tokens")).as("corpus_tokens"))
    per.groupBy("cluster_docs").agg(
        count(lit(1)).as("n_clusters"),
        sum(col("c_tokens")).as("n_tokens"),
        sum(col("c_tokens") - col("c_kept")).as("tokens_removed"))
      .crossJoin(broadcast(tot))
      .select(col("cluster_docs"), col("n_clusters"),
        col("n_tokens"), col("tokens_removed"),
        (col("tokens_removed").cast("double") / col("corpus_tokens").cast("double"))
          .as("frac_corpus_removed"))
      .orderBy("cluster_docs")
  }
}
