package graft

import graft.pipeline.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Versioned-snapshot table layer: time travel, manifest-diff CDC,
  * stats-pruned reads at a version, vacuum, and the optimistic-commit
  * failure path. */
class SnapshotSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("snap").resolve("t").toString

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"row$i")).toDF("k", "v")
  }

  test("commit/append/overwrite: every retained version reads exactly its snapshot") {
    val t = freshTable()
    val s1 = Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 4)
    assert(s1.version == 1 && s1.filesAdded == 4 && s1.filesTotal == 4)
    val s2 = Snapshots.commit(spark, df(100 until 150), t,
      statsCol = Some("k"), clustered = true, files = 2)
    assert(s2.version == 2 && s2.filesAdded == 2 && s2.filesTotal == 6)
    // overwrite: snapshot becomes just the new files; v1/v2 still readable
    val s3 = Snapshots.commit(spark, df(50 until 60), t,
      overwrite = true, statsCol = Some("k"), clustered = true, files = 1)
    assert(s3.version == 3 && s3.filesTotal == 1)
    assert(Snapshots.currentVersion(spark, t) == 3)
    assert(Snapshots.read(spark, t, 1).count() == 100)
    assert(Snapshots.read(spark, t, 2).count() == 150)
    assert(Snapshots.read(spark, t).count() == 10)
    // snapshots are value-exact, not just counts
    assert(Snapshots.read(spark, t, 2).select(sum("k")).head.getLong(0)
      == (0L until 150).sum)
  }

  test("diff reads only churned files and reports exact row-level changes") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 100), t, statsCol = Some("k"),
      clustered = true, files = 4)
    Snapshots.commit(spark, df(100 until 120), t, statsCol = Some("k"),
      clustered = true, files = 1)
    val d12 = Snapshots.diff(spark, t, 1, 2).collect()
    assert(d12.forall(_.getString(0) == "insert"))
    assert(d12.map(_.getLong(1)).sorted.toSeq == (100L until 120L))
    // overwrite that keeps 0-99 but rewrites values of 0-9
    import spark.implicits._
    val mutated = (0 until 100)
      .map(i => (i.toLong, if (i < 10) s"NEW$i" else s"row$i")).toDF("k", "v")
    Snapshots.commit(spark, mutated, t, overwrite = true,
      statsCol = Some("k"), clustered = true, files = 4)
    val d23 = Snapshots.diff(spark, t, 2, 3).collect()
    val ins = d23.filter(_.getString(0) == "insert").map(r => (r.getLong(1), r.getString(2)))
    val del = d23.filter(_.getString(0) == "delete").map(r => (r.getLong(1), r.getString(2)))
    // the 10 rewritten rows appear as delete+insert; 100-119 as deletes;
    // untouched rows 10-99 cancel (multiset) even though the overwrite
    // rewrote their files
    assert(ins.toSet == (0 until 10).map(i => (i.toLong, s"NEW$i")).toSet)
    assert(del.toSet == ((0 until 10).map(i => (i.toLong, s"row$i")) ++
      (100 until 120).map(i => (i.toLong, s"row$i"))).toSet)
  }

  test("readPruned at a version is filter-parity and actually prunes files") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 1000), t, statsCol = Some("k"),
      clustered = true, files = 8)
    val pruned = Snapshots.readPruned(spark, t, "k", 100.0, 150.0)
    val full = Snapshots.read(spark, t).filter(col("k").between(100, 150))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq
      == full.collect().map(_.getLong(0)).sorted.toSeq)
    // clustered ranges are disjoint: a 5% key range must touch < half the files
    val m = Snapshots.manifest(spark, t, 1)
      .filter(col("max_k") >= 100.0 && col("min_k") <= 150.0).count()
    assert(m < 4, s"pruning kept $m of 8 files")
    // out-of-range prunes to an empty, schema-correct frame
    assert(Snapshots.readPruned(spark, t, "k", 5000.0, 6000.0).isEmpty)
  }

  test("vacuum drops old versions and orphaned data files, keeps retained readable") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 50), t, files = 2)
    Snapshots.commit(spark, df(50 until 60), t, files = 1)
    Snapshots.commit(spark, df(0 until 5), t, overwrite = true, files = 1)
    // age 0: single-process test, no writer can be in flight
    val (manifestsDropped, filesDeleted) =
      Snapshots.vacuum(spark, t, keepLast = 1, orphanMinAgeMs = 0L)
    assert(manifestsDropped == 2)
    assert(filesDeleted == 3) // v1's 2 + v2's 1, unreferenced by v3
    assert(Snapshots.read(spark, t).count() == 5)
    intercept[IllegalArgumentException](Snapshots.read(spark, t, 1))
  }

  test("append with a divergent schema is rejected; overwrite may evolve it") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1)
    val widened = Seq((10L, "x", 1.5)).toDF("k", "v", "w")
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, widened, t, files = 1))
    val typeChanged = Seq((10, "x")).toDF("k", "v") // k: int, not long
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, typeChanged, t, files = 1))
    assert(Snapshots.currentVersion(spark, t) == 1)
    // overwrite evolves; the old version still reads under its own schema
    Snapshots.commit(spark, widened, t, overwrite = true, files = 1)
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("k", "v", "w"))
    assert(Snapshots.read(spark, t, 1).columns.toSeq == Seq("k", "v"))
  }

  test("batchSink: replayed micro-batches are no-ops; a live stream lands exactly-once") {
    val t = freshTable()
    val sink = graft.pipeline.Snapshots.batchSink(t, "q1", files = 1)
    sink(df(0 until 10), 0L)
    sink(df(10 until 20), 1L)
    assert(Snapshots.read(spark, t).count() == 20)
    // recovery replays the last batch — must be a no-op
    sink(df(10 until 20), 1L)
    assert(Snapshots.currentVersion(spark, t) == 2)
    assert(Snapshots.read(spark, t).count() == 20)
    assert(Snapshots.commitMeta(spark, t, 2) == "batch:q1:1")
    // a DIFFERENT query's batch 0 must not be mistaken for q1's replay
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = input.toDF().withColumnRenamed("value", "k").withColumn("v", lit("s"))
      .writeStream.foreachBatch(
        graft.pipeline.Snapshots.batchSink(t, "q2", files = 1))
      .start()
    try {
      input.addData(100L, 101L); q.processAllAvailable()
      input.addData(102L); q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.read(spark, t).filter(col("k") >= 100).count() == 3)
  }

  test("delete rewrites only hit files, keeps others by reference, time-travels") {
    val t = freshTable()
    // 4 clustered files over k=0..99 → hits confined to one key range
    Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 4)
    val before = Snapshots.manifest(spark, t, 1)
      .select("file").collect().map(_.getString(0)).toSet
    // pruned delete of k in [10, 14]: candidates only overlap-files
    val st = Snapshots.delete(spark, t, col("k") >= 10 && col("k") <= 14,
      prune = Some(("k", 10.0, 14.0)))
    assert(st.version == 2 && st.rowsDeleted == 5)
    assert(st.filesRewritten == 1, "hits span one clustered file")
    assert(st.filesKept == 3)
    val after = Snapshots.manifest(spark, t, 2)
      .select("file").collect().map(_.getString(0)).toSet
    // untouched files carried over BY REFERENCE (same basenames)
    assert((before intersect after).size == 3)
    val now = Snapshots.read(spark, t).select("k").collect().map(_.getLong(0))
    assert(now.length == 95 && !now.exists(k => k >= 10 && k <= 14))
    // value-exact: the surviving mass is the full range minus the hole
    assert(now.sum == (0L until 100).sum - (10L to 14L).sum)
    // time travel still serves the pre-delete snapshot
    assert(Snapshots.read(spark, t, 1).count() == 100)
    // re-clustered survivors keep stats-pruned reads tight
    assert(Snapshots.readPruned(spark, t, "k", 0.0, 20.0).count() == 16)
    // a DELETE with no hits burns no version
    val noop = Snapshots.delete(spark, t, col("k") === 9999L)
    assert(noop.version == 2 && noop.rowsDeleted == 0 && noop.filesRewritten == 0)
    assert(Snapshots.currentVersion(spark, t) == 2)
    // deleting EVERY row of a file drops it from the manifest entirely
    val wipe = Snapshots.delete(spark, t, col("k") < 25)
    assert(wipe.rowsDeleted == 20)
    assert(Snapshots.read(spark, t).count() == 75)
  }

  test("schemaDrift reports added/removed/retyped columns across an overwrite") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1) // (k: long, v: string)
    val evolved = (0 until 5)
      .map(i => (i.toString, s"row$i", i * 1.5)).toDF("k", "w", "score")
    Snapshots.commit(spark, evolved, t, overwrite = true, files = 1)
    val drift = Snapshots.schemaDrift(spark, t, 1, 2).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(drift == Set(
      ("score", "added", None, Some("double")),
      ("w", "added", None, Some("string")),
      ("v", "removed", Some("string"), None),
      ("k", "retyped", Some("bigint"), Some("string"))))
    // no drift between a version and itself
    assert(Snapshots.schemaDrift(spark, t, 2, 2).count() == 0)
  }

  test("write-audit-publish: a failed audit burns no version and leaves no files") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesBefore = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$t/data")).length
    // duplicate key → the pk_unique expectation must reject the commit
    val dirty = (Seq((7L, "dup"), (7L, "dup2")) ++
      (100 until 105).map(i => (i.toLong, s"row$i"))).toDF("k", "v")
    val ex = intercept[Snapshots.AuditFailed](
      Snapshots.commit(spark, dirty, t, files = 1, audit = Seq(
        "nonempty" -> (count(lit(1)) > 0),
        "pk_unique" -> (countDistinct(col("k")) === count(col("k"))))))
    assert(ex.failed == Seq("pk_unique"))
    assert(Snapshots.currentVersion(spark, t) == 1, "no version burned")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/data")).length
      == filesBefore, "staged files discarded")
    // the same data under passing expectations publishes normally
    val ok = Snapshots.commit(spark, df(100 until 105), t, files = 1,
      audit = Seq(
        "nonempty" -> (count(lit(1)) > 0),
        "pk_unique" -> (countDistinct(col("k")) === count(col("k")))))
    assert(ok.version == 2)
    assert(Snapshots.read(spark, t).count() == 15)
  }

  test("a commit that loses the manifest race fails and leaves no new version") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1)
    // occupy v000002 — the rename target of the next commit
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000002"))
    intercept[IllegalStateException](
      Snapshots.commit(spark, df(10 until 20), t, files = 1))
    // a stale LOCK (crashed holder) blocks the version the same way
    fs.delete(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000002"), true)
    fs.create(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000002.lock"),
      false).close()
    intercept[IllegalStateException](
      Snapshots.commit(spark, df(10 until 20), t, files = 1))
    assert(Snapshots.currentVersion(spark, t) == 1)
    // age-0 vacuum reclaims the debris; the version number is usable again
    Snapshots.vacuum(spark, t, keepLast = 5, orphanMinAgeMs = 0L)
    assert(Snapshots.commit(spark, df(10 until 20), t, files = 1).version == 2)
  }

  test("concurrent committers: every append lands exactly once, losers retry cleanly") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1)
    // 4 writers × 3 appends of disjoint key ranges, racing on the same
    // table; a loser sees IllegalStateException (the lock/exists abort
    // paths), re-reads the current version and retries — the contract a
    // real multi-writer deployment runs
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try {
          for (j <- 0 until 3) {
            val lo = 1000 * (3 * w + j + 1)
            var attempts = 0
            var done = false
            while (!done) {
              attempts += 1
              require(attempts <= 60, s"writer $w gave up after $attempts tries")
              try {
                Snapshots.commit(spark, df(lo until lo + 10), t, files = 1)
                done = true
              } catch { case _: IllegalStateException => Thread.sleep(20) }
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"writer died: ${Option(errors.peek())}")
    // 1 seed + 12 racing appends = 13 contiguous committed versions
    assert(Snapshots.currentVersion(spark, t) == 13)
    val rows = Snapshots.read(spark, t).select("k").collect().map(_.getLong(0))
    assert(rows.length == 130 && rows.distinct.length == 130,
      "every batch exactly once, no duplicates, no losses")
    // every intermediate version is a readable snapshot with a complete
    // manifest (no partial manifest ever became visible)
    (1 to 13).foreach(v => assert(Snapshots.read(spark, t, v).count() == 10L * v))
  }

  test("vacuum age threshold protects in-flight commit artifacts") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 20), t, files = 1)
    Snapshots.commit(spark, df(20 until 30), t, files = 1)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a commit IN FLIGHT right now: data file renamed into
    // data/, manifest dir + lock placed, marker not yet created
    val inflight = new org.apache.hadoop.fs.Path(s"$t/data/part-inflight.parquet")
    fs.create(inflight, false).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000003"))
    fs.create(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000003.lock"),
      false).close()
    // default retention: superseded manifests drop, but the young
    // unreferenced artifacts all survive (v1's data file included — age
    // cannot distinguish it from an in-flight writer's)
    val (dropped, deleted) = Snapshots.vacuum(spark, t, keepLast = 1)
    assert(dropped == 1 && deleted == 0)
    assert(fs.exists(inflight))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000003")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000003.lock")))
    assert(Snapshots.read(spark, t).count() == 30)
    // age 0 (maintenance window, no live writers): everything reclaims
    val (_, deleted0) = Snapshots.vacuum(spark, t, keepLast = 1, orphanMinAgeMs = 0L)
    // v2's manifest carries v1's file by reference (append), so the only
    // reclaimable orphan is the in-flight one
    assert(deleted0 == 1, "the in-flight orphan")
    assert(!fs.exists(inflight))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/_manifests/v000003.lock")))
    assert(Snapshots.read(spark, t).count() == 30)
  }

  test("null-stats manifest rows always survive pruning (readPruned + pruned delete)") {
    val t = freshTable()
    // mixed-stats table: one clustered append WITH stats, one append
    // WITHOUT statsCol (its manifest rows carry null key/min/max) —
    // exactly what Main's snapshot verb produces when snapshot_key is
    // optional per invocation
    Snapshots.commit(spark, df(0 until 50), t,
      statsCol = Some("k"), clustered = true, files = 2)
    Snapshots.commit(spark, df(50 until 100), t, files = 2) // no stats
    val m = Snapshots.manifest(spark, t, 2)
    assert(m.filter(col("key").isNull).count() == 2, "unstatsed files present")
    // readPruned must keep the null-stats files in the scan: rows 60-70
    // live ONLY in them
    val pruned = Snapshots.readPruned(spark, t, "k", 40.0, 70.0)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == (40L to 70L),
      "strict optimization violated — null-stats rows dropped")
    // a pruned GDPR delete must remove matching rows from unstatsed
    // files too, not report success while leaving them behind
    val st = Snapshots.delete(spark, t, col("k") >= 45 && col("k") <= 55,
      prune = Some(("k", 45.0, 55.0)))
    assert(st.rowsDeleted == 11, s"deleted ${st.rowsDeleted} of 11 matches")
    val left = Snapshots.read(spark, t).select("k").collect().map(_.getLong(0))
    assert(left.length == 89 && !left.exists(k => k >= 45 && k <= 55))
    // a file keyed on a DIFFERENT column (here "v", whose string stats
    // cast to null) says nothing about "k" — a k-pruned delete must
    // still treat it as a candidate and delete its matching rows
    Snapshots.commit(spark, df(100 until 120), t, statsCol = Some("v"), files = 1)
    val m3 = Snapshots.manifest(spark, t, Snapshots.currentVersion(spark, t))
    assert(m3.filter(col("key") === "v").count() == 1, "other-keyed file present")
    val st2 = Snapshots.delete(spark, t, col("k") >= 105 && col("k") <= 114,
      prune = Some(("k", 105.0, 114.0)))
    assert(st2.rowsDeleted == 10, s"deleted ${st2.rowsDeleted} of 10 matches " +
      "— the other-column-keyed file must not be pruned away")
  }

  private def dfv(range: Range, prefix: String) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"$prefix$i")).toDF("k", "v")
  }

  test("upsert: matched keys replaced, rest inserted, untouched files by reference") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 4)
    // 20 matches (in one clustered range) + 5 inserts
    val st = Snapshots.upsert(spark, t, dfv(80 until 105, "up"), "k",
      prune = Some(("k", 80.0, 104.0)))
    assert(st.version == 2)
    assert(st.rowsUpdated == 20 && st.rowsInserted == 5, st.toString)
    // pruning kept the cold files out of the rewrite
    assert(st.filesRewritten < 4, s"pruned upsert rewrote ${st.filesRewritten} of 4 files")
    val out = Snapshots.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 105)
    (0 until 80).foreach(i => assert(out(i.toLong) == s"row$i"))
    (80 until 105).foreach(i => assert(out(i.toLong) == s"up$i"))
    // time travel: v1 still reads the pre-upsert snapshot
    assert(Snapshots.read(spark, t, 1).count() == 100)
    // empty updates burn no version
    val st0 = Snapshots.upsert(spark, t, dfv(0 until 0, "x"), "k")
    assert(st0.version == 2 && st0.rowsUpdated == 0 && st0.rowsInserted == 0)
  }

  test("racing upserts on overlapping key ranges: loser retries, no lost update") {
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 4)
    // A rewrites keys 40-59 and inserts 100-104; B rewrites 50-69 and
    // inserts 110-114 — the 50-59 overlap forces both to rewrite the
    // same files, and whoever publishes second must have recomputed
    // against the winner's version (CommitContention + built-in retry)
    // or A's/B's disjoint effects would be silently lost
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(prefix: String, upd: Range, ins: Range) = new Thread(() => {
      try {
        gate.await()
        val updates = dfv(upd, prefix).unionByName(dfv(ins, prefix))
        Snapshots.upsert(spark, t, updates, "k")
      } catch { case e: Throwable => errors.add(e) }
    })
    val a = writer("A", 40 until 60, 100 until 105)
    val b = writer("B", 50 until 70, 110 until 115)
    a.start(); b.start(); gate.countDown()
    a.join(); b.join()
    assert(errors.isEmpty, s"writer died: ${Option(errors.peek())}")
    assert(Snapshots.currentVersion(spark, t) == 3,
      "both upserts must have committed (serialized to v2 then v3)")
    val out = Snapshots.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 110, s"expected 110 distinct keys, got ${out.size}")
    // both writers' NON-overlapping effects are visible — the lost-update check
    (40 until 50).foreach(i => assert(out(i.toLong) == s"A$i",
      s"key $i lost writer A's update: ${out(i.toLong)}"))
    (60 until 70).foreach(i => assert(out(i.toLong) == s"B$i",
      s"key $i lost writer B's update: ${out(i.toLong)}"))
    (100 until 105).foreach(i => assert(out(i.toLong) == s"A$i"))
    (110 until 115).foreach(i => assert(out(i.toLong) == s"B$i"))
    // the overlap belongs wholly to whichever writer committed LAST —
    // last-writer-wins per key, applied atomically per commit
    val overlap = (50 until 60).map(i => out(i.toLong).take(1)).toSet
    assert(overlap.size == 1 && (overlap("A") || overlap("B")),
      s"overlap range must be one writer's block, got $overlap")
    (0 until 40).foreach(i => assert(out(i.toLong) == s"row$i"))
    // every version remains a readable snapshot
    assert(Snapshots.read(spark, t, 1).count() == 100)
    assert(Snapshots.read(spark, t, 2).count() >= 100)
  }

  test("mergeSchema append: added column reads null for old files, time travel keeps both schemas") {
    import spark.implicits._
    val t = freshTable()
    // v1: (k, v) clustered on k
    Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 2)
    // plain append of a WIDER frame still rejects without the flag
    val widened = (100 until 120)
      .map(i => (i.toLong, s"row$i", i * 1.5)).toDF("k", "v", "w")
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, widened, t, files = 1))
    // mergeSchema append must still carry every live column at type
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, Seq((120L, 1.0)).toDF("k", "w"), t,
        files = 1, mergeSchema = true))
    // v2: evolved append — membership now mixes file generations
    val s2 = Snapshots.commit(spark, widened, t,
      statsCol = Some("k"), clustered = true, files = 1, mergeSchema = true)
    assert(s2.version == 2)
    val v2 = Snapshots.read(spark, t)
    assert(v2.columns.toSeq == Seq("k", "v", "w"), "live columns lead, added trail")
    assert(v2.count() == 120)
    assert(v2.filter(col("w").isNull).count() == 100, "old files read the added column as null")
    assert(v2.filter(col("w").isNotNull).count() == 20)
    assert(v2.filter(col("k") === 110).select("w").head.getDouble(0) == 165.0)
    // time travel: v1 reads under ITS recorded schema — no w column
    assert(Snapshots.read(spark, t, 1).columns.toSeq == Seq("k", "v"))
    // schemaDrift sees the evolution from the sidecars
    val drift = Snapshots.schemaDrift(spark, t, 1, 2).collect()
    assert(drift.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("w", "added")))
    // pruned reads still work over the mixed membership (and find the
    // evolved rows: the v2 file is clustered on k too)
    val pruned = Snapshots.readPruned(spark, t, "k", 100, 119)
    assert(pruned.count() == 20 && pruned.filter(col("w").isNull).count() == 0)
    // DML over the mixed membership: delete an OLD row — the rewrite
    // carries the evolved schema, and the surviving old rows keep w=null
    val del = Snapshots.delete(spark, t, col("k") === 5L,
      prune = Some(("k", 5.0, 5.0)))
    assert(del.rowsDeleted == 1)
    val v3 = Snapshots.read(spark, t)
    assert(v3.count() == 119 && v3.columns.toSeq == Seq("k", "v", "w"))
    assert(v3.filter(col("w").isNull).count() == 99)
    // upsert an evolved-shape row into the mixed table
    val up = Snapshots.upsert(spark, t,
      Seq((0L, "ZERO", 0.5)).toDF("k", "v", "w"), "k",
      prune = Some(("k", 0.0, 0.0)))
    assert(up.rowsUpdated == 1 && up.rowsInserted == 0)
    val v4 = Snapshots.read(spark, t)
    assert(v4.filter(col("k") === 0L).select("v", "w").head()
      .toSeq == Seq("ZERO", 0.5))
    assert(v4.count() == 119)
  }

  test("evolved schema becomes the live append contract; vacuum keeps sidecars consistent") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 50), t, files = 1)
    Snapshots.commit(spark,
      (50 until 60).map(i => (i.toLong, s"row$i", i * 2.0)).toDF("k", "v", "w"),
      t, files = 1, mergeSchema = true)
    // after the evolution, a PLAIN append must carry the evolved schema —
    // the pre-evolution shape is now the mismatch
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, df(60 until 70), t, files = 1))
    Snapshots.commit(spark,
      (60 until 70).map(i => (i.toLong, s"row$i", i * 2.0)).toDF("k", "v", "w"),
      t, files = 1)
    assert(Snapshots.read(spark, t).count() == 70)
    assert(Snapshots.read(spark, t).filter(col("w").isNull).count() == 50)
    // vacuum to the latest version: dropped versions lose their .schema
    // sidecars, the retained version still reads under its recorded schema
    val md = new org.apache.hadoop.fs.Path(t, "_manifests")
    val fs = md.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.vacuum(spark, t, keepLast = 1, orphanMinAgeMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(md, "v000001.schema")),
      "dropped version's schema sidecar must be reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(md, "v000003.schema")))
    val after = Snapshots.read(spark, t)
    assert(after.columns.toSeq == Seq("k", "v", "w") && after.count() == 70)
    assert(after.filter(col("w").isNull).count() == 50)
  }

  private def dataFiles(t: String): Set[String] = {
    val dd = new org.apache.hadoop.fs.Path(t, "data")
    dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(dd).map(_.getPath.getName).toSet
  }

  test("renameColumn: metadata-only, time travel per-version names, DML keeps working") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 100), t,
      statsCol = Some("k"), clustered = true, files = 4)
    val before = dataFiles(t)
    assert(Snapshots.renameColumn(spark, t, "v", "label") == 2)
    assert(Snapshots.renameColumn(spark, t, "k", "id") == 3)
    // zero data files touched by either rename
    assert(dataFiles(t) == before, "rename must not rewrite data files")
    // latest reads under the new names with values intact; time travel
    // serves v1 under the original names
    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "label"))
    assert(cur.select(sum("id")).head.getLong(0) == (0L until 100).sum)
    assert(cur.filter(col("label") === "row7").count() == 1)
    assert(Snapshots.read(spark, t, 1).columns.toSeq == Seq("k", "v"))
    // manifest stats were re-keyed: pruning on the RENAMED stats column
    // still skips files
    val pruned = Snapshots.readPruned(spark, t, "id", 0, 10)
    assert(pruned.count() == 11)
    assert(pruned.inputFiles.length < 4, "rename lost the pruning stats")
    // appends speak the new schema — the old shape is now the mismatch
    intercept[IllegalArgumentException](
      Snapshots.commit(spark, df(100 until 110), t, files = 1))
    Snapshots.commit(spark,
      (100 until 110).map(i => (i.toLong, s"row$i")).toDF("id", "label"),
      t, statsCol = Some("id"), files = 1)
    assert(Snapshots.read(spark, t).count() == 110)
    // MERGE through the rename: pre-rename files rewrite under the
    // mapping, post-rename files as written
    val st = Snapshots.upsert(spark, t,
      Seq((5L, "edited"), (200L, "new")).toDF("id", "label"), "id")
    assert(st.rowsUpdated == 1 && st.rowsInserted == 1)
    val m = Snapshots.read(spark, t).filter(col("id").isin(5L, 200L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(5L -> "edited", 200L -> "new"))
  }

  test("dropColumn: hidden without rewrites; a re-added name reads null " +
       "from old files, never their stale bytes") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark,
      (0 until 50).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("k", "v", "extra"),
      t, files = 2)
    val before = dataFiles(t)
    assert(Snapshots.dropColumn(spark, t, "extra") == 2)
    assert(dataFiles(t) == before, "drop must not rewrite data files")
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("k", "v"))
    assert(Snapshots.read(spark, t, 1).columns.toSeq == Seq("k", "v", "extra"))
    // drift reports the drop as removed, not as a rename to a placeholder
    val drift = Snapshots.schemaDrift(spark, t, 1, 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(drift == Set(("extra", "removed")), drift.toString)
    // re-add the SAME logical name: old files hold 'extra' bytes
    // physically, but the re-added column must get a fresh physical name
    // and read NULL from them — stale values must never resurface
    Snapshots.commit(spark,
      (50 until 60).map(i => (i.toLong, s"row$i", i * 100.0)).toDF("k", "v", "extra"),
      t, files = 1, mergeSchema = true)
    val cur = Snapshots.read(spark, t)
    assert(cur.count() == 60)
    assert(cur.filter(col("k") < 50 && col("extra").isNotNull).count() == 0,
      "old files' stale bytes resurfaced under the re-added column")
    assert(cur.filter(col("k") >= 50 && col("extra") === col("k") * 100.0).count() == 10)
    // time travel across the whole history: v1 serves the ORIGINAL extra
    assert(Snapshots.read(spark, t, 1)
      .filter(col("extra") === col("k") * 1.5).count() == 50)
  }

  test("renameColumn: a freed logical name can be re-taken — values follow physical identity") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 10), t, files = 1)
    // v→w frees "v"; k→v re-takes it. Logical v now maps to PHYSICAL k
    // and logical w to physical v — reads must follow the mapping, not
    // the name, for files written before AND after the swap.
    Snapshots.renameColumn(spark, t, "v", "w")
    Snapshots.renameColumn(spark, t, "k", "v")
    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("v", "w"))
    assert(cur.select(sum("v")).head.getLong(0) == (0L until 10).sum,
      "logical v must carry the old k values")
    assert(cur.filter(col("w") === "row3").count() == 1,
      "logical w must carry the old v values")
    Snapshots.commit(spark,
      (10 until 15).map(i => (i.toLong, s"row$i")).toDF("v", "w"), t, files = 1)
    val mixed = Snapshots.read(spark, t)
    assert(mixed.count() == 15 &&
      mixed.select(sum("v")).head.getLong(0) == (0L until 15).sum)
    // time travel to v1 still serves the original names and values
    val v1 = Snapshots.read(spark, t, 1)
    assert(v1.columns.toSeq == Seq("k", "v") &&
      v1.filter(col("v") === "row3").count() == 1)
  }

  test("empty append burns a version with its meta, membership unchanged") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 20), t, files = 2)
    // zero-row append: no part files are written (schema inference over
    // the empty tmp dir used to throw), but the version + meta land —
    // the dedupappend torn-state stamp depends on exactly this
    val st = Snapshots.commit(spark, df(0 until 0), t, meta = "stamp:v7")
    assert(st.version == 2 && st.filesAdded == 0 && st.filesTotal == 2)
    assert(Snapshots.commitMeta(spark, t, 2) == "stamp:v7")
    assert(Snapshots.read(spark, t).count() == 20)
    // a write-audit-publish expectation still evaluates (and a nonempty
    // audit correctly rejects an empty append, burning nothing)
    intercept[Snapshots.AuditFailed](Snapshots.commit(spark, df(0 until 0), t,
      audit = Seq(("nonempty", count(lit(1)) > 0))))
    assert(Snapshots.currentVersion(spark, t) == 2)
  }

  test("zero-row overwrite truncates the table and stays readable") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 20), t, files = 2)
    // truncate: empty membership published — reads must serve an empty
    // frame under the recorded schema, not throw on the empty file set
    // (r14 review: this used to brick the table's current version)
    val st = Snapshots.commit(spark, df(0 until 0), t, overwrite = true)
    assert(st.version == 2 && st.filesTotal == 0)
    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("k", "v") && cur.count() == 0)
    assert(Snapshots.readPruned(spark, t, "k", 0, 5).count() == 0)
    assert(Snapshots.read(spark, t, 1).count() == 20, "time travel past the truncate")
    // CDC across the truncate reports the 20 deletes
    assert(Snapshots.diff(spark, t, 1, 2)
      .filter(col("_op") === "delete").count() == 20)
    // life goes on: append after the truncate
    Snapshots.commit(spark, df(100 until 105), t, files = 1)
    assert(Snapshots.read(spark, t).count() == 5)
  }

  test("dropColumn of the stats key leaves the DML triad working") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(spark, df(0 until 40), t,
      statsCol = Some("k"), clustered = true, files = 2)
    Snapshots.dropColumn(spark, t, "k")
    // delete + upsert on the surviving column: the dead stats key must
    // degrade to an unclustered rewrite, not an unresolved-column failure
    val del = Snapshots.delete(spark, t, col("v") === "row3")
    assert(del.rowsDeleted == 1)
    val up = Snapshots.upsert(spark, t,
      Seq("row5", "brandnew").toDF("v"), "v")
    assert(up.rowsUpdated == 1 && up.rowsInserted == 1)
    assert(Snapshots.read(spark, t).count() == 40) // 40 - 1 + 1
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("v"))
  }
}
