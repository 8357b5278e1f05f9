package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned-snapshot table layer (SURVEY §2.13 layout family) — the
  * transaction-log discipline the in-place maintenance passes
  * ([[graft.sources.Sources.upsertClustered]]/`compact`) deliberately
  * lack: every commit writes IMMUTABLE data files plus a new manifest,
  * so readers get snapshot isolation, any retained version stays
  * readable (time travel), the delta between two versions is computable
  * from the manifest diff reading ONLY changed files (CDC), and space
  * is reclaimed explicitly ([[vacuum]]) instead of by destructive
  * rewrite. This is the Delta/Iceberg core in miniature, built on two
  * primitives every Hadoop-API filesystem has: unique part-file names
  * and atomic rename.
  *
  * Layout:
  * {{{
  *   <table>/data/part-*.parquet      immutable; only vacuum deletes
  *   <table>/_manifests/v%06d/        one parquet dir per version:
  *       (file, rows, key, min_k, max_k) rows — file membership plus
  *       optional per-file min/max stats for planner-level pruning
  *   <table>/_manifests/v%06d.schema  recorded reader schema (JSON) —
  *       carries add-column evolution across mixed file generations
  * }}}
  *
  * Commit protocol: write data files to a tmp dir → rename them into
  * `data/` (names are UUID-unique, no collision) → write the manifest
  * to a tmp dir → rename it to `v{N+1}` → atomically CREATE the marker
  * file `v{N+1}.ok` with overwrite=false. The marker create is the
  * commit point. ATOMICITY IS PER-FILESYSTEM, not a Hadoop-API
  * guarantee (ADVICE r11): `create(path, overwrite=false)` is
  * namenode-arbitrated on HDFS but an exists-check-then-open on
  * RawLocalFileSystem and a blind PUT on most object stores — two
  * racers can both pass. [[createExclusive]] therefore routes file://
  * through `java.nio.Files.createFile` (O_EXCL at the kernel, the
  * primitive Delta's HDFSLogStore posture assumes), keeps the Hadoop
  * call for hdfs://, and REFUSES unknown schemes loudly — s3a/gs/abfs
  * need a conditional-put LogStore, and corrupting a manifest silently
  * is worse than failing a commit. A bare dir rename silently moves
  * INTO an existing destination, so it can never arbitrate the race
  * itself. Readers only see
  * versions whose marker exists; a writer that loses the race (or
  * finds a stale unmarked dir from a crashed writer) throws, and its
  * data files are orphans — invisible to every reader — until
  * [[vacuum]] collects them along with stale manifest dirs.
  *
  * Scale posture: manifests are parquet and read distributed — nothing
  * here collects file lists except [[vacuum]] (bounded by the retained
  * FILE count, require()d — the statsCatalog contract). A 100 TB table
  * with 10⁶ files has manifests of ~10⁶ rows: metadata-sized.
  */
object Snapshots {

  final case class CommitStats(version: Long, filesAdded: Int, filesTotal: Long)

  /** A commit lost the optimistic-concurrency race (the version lock, or
    * a stale current-version read): the table is untouched by this
    * writer, and re-reading the current version and recomputing is the
    * remedy. Subclasses IllegalStateException so callers that treated
    * every abort as fatal keep working; [[upsert]] catches THIS type to
    * retry and lets genuine I/O faults propagate. */
  final class CommitContention(msg: String) extends IllegalStateException(msg)

  private val ManifestSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("min_k", DoubleType, nullable = true),
    StructField("max_k", DoubleType, nullable = true)))

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- column mapping: rename/drop without file rewrites ---------------
  // (VERDICT r13 item 5 — the Delta column-mapping posture). Every field
  // of a recorded schema has a LOGICAL name (the field name readers see)
  // and a PHYSICAL name (the parquet column name in data files, stamped
  // in the field metadata once they diverge). Data files are ALWAYS
  // written under physical names, so a rename is one metadata-only
  // manifest commit (logical name changes, physical stays), and a drop
  // is a metadata-only commit that TOMBSTONES the field: readers stop
  // requesting it (parquet never even decodes the column), no file is
  // rewritten, and the tombstone keeps the physical name reserved so a
  // later re-add of the same logical name gets a FRESH physical name —
  // old files' stale bytes can never resurface under the new column
  // (they read as null, the add-column contract).
  private val PhysKey = "graft.physicalName"
  private val DroppedKey = "graft.dropped"
  private def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name
  private def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)
  /** reader-facing fields of a recorded schema (tombstones excluded). */
  private def visible(st: StructType): StructType =
    StructType(st.fields.filterNot(isDropped))
  /** physical column name serving logical `c` under `sch` (identity for
    * legacy tables and unmapped fields). */
  private def physicalOf(sch: Option[StructType], c: String): String =
    sch.flatMap(st => visible(st).fields.find(_.name == c).map(physicalName))
      .getOrElse(c)
  /** a logical-named frame, renamed to the physical column layout data
    * files are written in (recorded order; identity when no schema). */
  private def toPhysical(df: DataFrame, sch: Option[StructType]): DataFrame =
    sch match {
      case Some(st) =>
        val vis = visible(st)
        df.select(vis.fields.map(f => col(f.name).as(physicalName(f)))
          .toIndexedSeq: _*)
      case None => df
    }

  /** Atomic exists-exclusive create of a zero-byte arbiter file — throws
    * Hadoop's `FileAlreadyExistsException` iff the file already exists
    * (the ONE lost-the-race signal the lock site may map to
    * [[CommitContention]]; ADVICE r12: a generic IOException here also
    * covered permissions/disk-full/parent-create faults, and the retry
    * loop then hammered a non-retriable fault 5 times under a misleading
    * 'lost the version lock' message). Genuine I/O faults propagate as
    * plain IOExceptions. See the commit-protocol doc above for why this
    * is per-scheme: the Hadoop `create(p, false)` is only atomic where a
    * central arbiter (the HDFS namenode) backs it. */
  private def createExclusive(fs: FileSystem, p: Path): Unit = fs.getScheme match {
    case "file" =>
      // qualify against the fs working dir so relative table paths
      // resolve the same way every other Hadoop call here resolves them
      val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      if (local.getParent != null) java.nio.file.Files.createDirectories(local.getParent)
      try java.nio.file.Files.createFile(local)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$p already exists")
      }
    // the namenode raises Hadoop's FileAlreadyExistsException on the
    // exists case; other faults surface as their own IOException types
    case "hdfs" => fs.create(p, false).close()
    case other => throw new UnsupportedOperationException(
      s"snapshot commit needs an atomic putIfAbsent and '$other' has none in the " +
        "plain Hadoop API — wire a conditional-PUT arbiter (the Delta LogStore " +
        "pattern) for this scheme before committing to it")
  }

  private def manifestDir(table: String) = new Path(table, "_manifests")
  private def dataDir(table: String) = new Path(table, "data")

  /** Recorded reader schema of `version` — the v%06d.schema sidecar
    * (StructType JSON, written before the marker like the meta sidecar,
    * so a committed version's schema is always complete). `None` for
    * versions committed before schema recording existed (their
    * membership is schema-uniform by the old exact-match append rule, so
    * footer-derived schemas remain correct for them).
    *
    * This is what carries ADD-COLUMN EVOLUTION through snapshots
    * (VERDICT r12 item 7, the Delta behavior): after a `mergeSchema`
    * append, the membership mixes file generations — readers apply the
    * RECORDED schema and parquet fills the evolved column with null for
    * old files; time travel to a pre-evolution version reads under THAT
    * version's recorded schema, without the column. */
  def readerSchema(spark: SparkSession, table: String,
                   version: Long): Option[StructType] = {
    val p = new Path(manifestDir(table), f"v$version%06d.schema")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(DataType.fromJson(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
      finally in.close()
    }
  }

  /** Committed versions only: the `.ok` marker is the commit point. */
  private def markerOf(name: String): Option[Long] =
    if (name.matches("v\\d{6}\\.ok")) Some(name.drop(1).dropRight(3).toLong)
    else None

  /** Highest committed version, 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val md = manifestDir(table)
    val fs = fsOf(spark, md)
    if (!fs.exists(md)) 0L
    else fs.listStatus(md).flatMap(s => markerOf(s.getPath.getName)) match {
      case vs if vs.isEmpty => 0L
      case vs => vs.max
    }
  }

  /** Manifest frame of `version` (file membership + optional stats). */
  def manifest(spark: SparkSession, table: String, version: Long): DataFrame = {
    val p = new Path(manifestDir(table), f"v$version%06d")
    val fs = fsOf(spark, p)
    require(fs.exists(new Path(manifestDir(table), f"v$version%06d.ok")),
      s"$table has no committed version $version")
    spark.read.schema(ManifestSchema).parquet(p.toString)
  }

  /** Commit `df` as the next version. `overwrite = false` appends to the
    * current snapshot's membership; `true` replaces it (the old files
    * stay on disk — prior versions remain readable until [[vacuum]]).
    * `statsCol` additionally records per-file min/max of that column in
    * the manifest, enabling [[readPruned]]; with `clustered = true` the
    * data is range-partitioned on it first so file ranges are disjoint
    * (writeClustered's layout, now versioned). */
  /** Audit failure from a write-audit-publish commit: the staged files
    * were discarded, NO version was burned, the table is untouched. */
  final class AuditFailed(val failed: Seq[String])
    extends IllegalStateException(
      s"commit audit failed: ${failed.mkString(", ")} — staged files " +
        "discarded, no version published")

  /** @param audit write-audit-publish expectations: (name, boolean
    *   AGGREGATE expression) pairs evaluated over the STAGED files in
    *   one pass — e.g. `("nonempty", count(lit(1)) > 0)`, `("pk_unique",
    *   countDistinct(col("k")) === count(col("k")))`. Any false
    *   expectation aborts BEFORE publish: staged files are deleted, no
    *   version number is consumed, and [[AuditFailed]] names the failed
    *   checks. The audit reads what was actually WRITTEN (not the input
    *   frame), so it also gates nondeterministic upstream bugs —
    *   the WAP pattern's whole point. */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             overwrite: Boolean = false, statsCol: Option[String] = None,
             clustered: Boolean = false, files: Int = 0,
             meta: String = "",
             audit: Seq[(String, Column)] = Nil,
             mergeSchema: Boolean = false): CommitStats = {
    require(!clustered || statsCol.nonEmpty, "clustered commit needs statsCol")
    val dd = dataDir(table)
    val fs = fsOf(spark, dd)
    fs.mkdirs(dd)
    fs.mkdirs(manifestDir(table))
    // appends must match the live schema EXACTLY (name → type, order
    // apart) unless mergeSchema: a silently divergent append would
    // poison every later read of the mixed membership. With mergeSchema
    // an append may ADD columns (every live column still required, typed
    // as recorded) — the evolved schema is recorded in the version's
    // sidecar and old files read the new column as null. Overwrites may
    // reshape freely — the new membership is self-consistent and old
    // versions stay readable under their own recorded schema via time
    // travel.
    val curV = currentVersion(spark, table)
    // LAZY: appends force it for validation + the recorded schema;
    // overwrites never touch it (their schema is self-defining, and a
    // legacy table's fallback read here would be pure wasted I/O)
    lazy val liveSchema: Option[StructType] =
      if (curV > 0) Some(readerSchema(spark, table, curV)
        .getOrElse(read(spark, table, curV).schema))
      else None
    if (!overwrite && curV > 0) {
      // tombstoned (dropped) fields are not part of the append contract —
      // writers neither see nor supply them
      val live = visible(liveSchema.get).map(f => f.name -> f.dataType).toMap
      val incoming = df.schema.map(f => f.name -> f.dataType).toMap
      if (mergeSchema) {
        val broken = live.toSeq.sortBy(_._1)
          .filterNot { case (n, t) => incoming.get(n).contains(t) }
        require(broken.isEmpty,
          s"mergeSchema append for $table v$curV must carry every live " +
            s"column at its recorded type; missing/retyped: " +
            broken.mkString(", "))
      } else require(incoming == live,
        s"append schema mismatch for $table v$curV: " +
          s"table has ${live.toSeq.sortBy(_._1).mkString(", ")}; " +
          s"append has ${incoming.toSeq.sortBy(_._1).mkString(", ")} " +
          "(mergeSchema=true to add columns, overwrite=true to reshape)")
    }
    // the NEXT version's recorded schema: on append, live columns first
    // (stable positions for existing readers) then the added ones, all
    // nullable — old files lack them; on overwrite/first commit the
    // frame is self-defining
    val recorded: StructType =
      if (overwrite || curV == 0L) df.schema
      else liveSchema match {
        case Some(ls) =>
          val visNames = visible(ls).fieldNames.toSet
          // physical names already in use — live fields AND tombstones
          // (a dropped column's bytes still sit in old files)
          val reserved = ls.fields.map(physicalName).toSet
          val added = df.schema.filterNot(f => visNames.contains(f.name))
            .map { f0 =>
              val f = f0.copy(nullable = true)
              if (reserved.contains(physicalName(f))) {
                // re-added after a drop (or physical collision): mint a
                // fresh physical name so old files' stale bytes stay
                // invisible — the new column reads null from them
                val mb = new MetadataBuilder().withMetadata(f.metadata)
                  .putString(PhysKey, s"${f.name}_v${curV + 1}").build()
                f.copy(metadata = mb)
              } else f
            }
          StructType(ls.fields ++ added)
        case None => df.schema
      }

    // 1. data files → tmp, stats computed there (basenames survive the
    //    rename, so the manifest rows stay valid)
    val tmp = new Path(table, s"_commit_tmp_${java.util.UUID.randomUUID()}")
    val shaped = (statsCol, clustered) match {
      case (Some(c), true) =>
        val n = if (files > 0) files else math.max(1, df.rdd.getNumPartitions)
        df.repartitionByRange(n, col(c)).sortWithinPartitions(c)
      case _ => if (files > 0) df.repartition(files) else df
    }
    // data files always carry PHYSICAL column names — that is what makes
    // rename/drop metadata-only (identity until a mapping exists)
    toPhysical(shaped, Some(recorded)).write
      .mode(SaveMode.ErrorIfExists).parquet(tmp.toString)

    // read back under logical names so audit expressions and the stats
    // key (both caller-facing) keep addressing logical columns. A
    // ZERO-ROW append writes no part files (r14: schema inference over
    // the empty tmp dir would throw), so it reads as an explicit empty
    // frame instead — the commit still burns a version with its meta
    // (the dedupappend torn-state stamp depends on that), audits still
    // evaluate (a nonempty expectation correctly fails), membership is
    // carried unchanged.
    val tmpParts = partFiles(fs, tmp)
    val written =
      if (tmpParts.nonEmpty) readBack(spark, tmp, Some(recorded))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(visible(recorded).fields.map(_.copy(nullable = true))))
    if (audit.nonEmpty) {
      val verdicts = written
        .agg(audit.head._2.as(audit.head._1),
          audit.tail.map { case (n, c) => c.as(n) }: _*)
        .collect().head
      val failed = audit.map(_._1).zipWithIndex.collect {
        case (n, i) if verdicts.isNullAt(i) || !verdicts.getBoolean(i) => n
      }
      if (failed.nonEmpty) {
        fs.delete(tmp, true)
        throw new AuditFailed(failed)
      }
    }
    val stats = statsRowsOf(written, statsCol)
    // the new-file manifest rows are file-count-sized; materialize them
    // BEFORE the tmp dir disappears under the reads above
    val newRows = stats.collect()
    require(newRows.length <= 1000000,
      s"${newRows.length} files in one commit — not metadata-sized")
    tmpParts.foreach { p =>
      require(fs.rename(p, new Path(dd, p.getName)), s"rename $p failed")
    }
    fs.delete(tmp, true)

    // 2. next manifest = (previous membership if appending) + new rows.
    // The version is NOT re-read here (r13 self-review): validation, the
    // recorded schema, and the publish target must all come from the ONE
    // curV snapshot — a re-read would let a concurrent commit that landed
    // mid-write slip underneath (this writer would then target v+2 with a
    // schema validated against v, and the lock on v+2 would never fire).
    // Targeting curV+1 instead makes that race a CommitContention.
    val newManifest = spark.createDataFrame(
      java.util.Arrays.asList(newRows: _*), ManifestSchema)
    val full =
      if (overwrite || curV == 0L) newManifest
      else manifest(spark, table, curV).unionByName(newManifest)
    publishManifest(spark, table, curV, full, meta, Some(recorded))
    val total = manifest(spark, table, curV + 1).count()
    CommitStats(curV + 1, newRows.length, total)
  }

  /** part files of a just-written tmp dir — the one detection shared by
    * commit/delete/upsert for both the wrote-anything probe and the
    * rename-into-place loop (r14 review: three verbatim copies). */
  private def partFiles(fs: FileSystem, tmp: Path): Array[Path] =
    fs.listStatus(tmp).map(_.getPath).filter(_.getName.endsWith(".parquet"))

  /** re-read a tmp dir this writer just wrote via [[toPhysical]],
    * surfacing logical names again (the file column order IS the
    * recorded visible order — toPhysical wrote it). */
  private def readBack(spark: SparkSession, tmp: Path,
                       sch: Option[StructType]): DataFrame = {
    val df = spark.read.parquet(tmp.toString)
    sch.map(st => df.toDF(visible(st).fieldNames.toIndexedSeq: _*)).getOrElse(df)
  }

  /** per-file manifest rows (file, rows, key, min_k, max_k) of a frame
    * that was just written — shared by [[commit]] and [[delete]]. */
  private def statsRowsOf(written: DataFrame,
                          statsCol: Option[String]): DataFrame =
    statsCol match {
      case Some(c) =>
        // try_cast, not cast: under ANSI (Spark 4 default) a stats key
        // whose value doesn't parse as a number would THROW and fail
        // the whole commit — null stats (file never pruned, advice-fix
        // contract) is the right degradation for a non-numeric key
        written.select(input_file_name().as("f"),
          expr(s"try_cast(`$c` AS DOUBLE)").as("k"))
          .groupBy("f")
          .agg(count(lit(1)).as("rows"), min("k").as("min_k"), max("k").as("max_k"))
          .select(
            element_at(split(col("f"), "/"), -1).as("file"), col("rows"),
            lit(c).as("key"), col("min_k"), col("max_k"))
      case None =>
        written.select(input_file_name().as("f"))
          .groupBy("f").agg(count(lit(1)).as("rows"))
          .select(element_at(split(col("f"), "/"), -1).as("file"), col("rows"),
            lit(null).cast("string").as("key"),
            lit(null).cast("double").as("min_k"),
            lit(null).cast("double").as("max_k"))
    }

  /** Steps 3–5 of every snapshot write: place the next manifest dir,
    * write the meta sidecar, then the exists-exclusive atomic marker —
    * the commit point. Shared by [[commit]] and [[delete]]; the
    * exists-check + marker race handling must stay byte-identical or
    * the concurrent-writer contract silently forks. */
  private def publishManifest(spark: SparkSession, table: String, cur: Long,
                              full: DataFrame, meta: String,
                              schema: Option[StructType] = None): Unit = {
    val fs = fsOf(spark, manifestDir(table))
    val mTmp = new Path(table, s"_manifest_tmp_${java.util.UUID.randomUUID()}")
    full.coalesce(1).write.mode(SaveMode.ErrorIfExists).parquet(mTmp.toString)
    val target = new Path(manifestDir(table), f"v${cur + 1}%06d")
    val okFile = new Path(manifestDir(table), f"v${cur + 1}%06d.ok")
    val lockFile = new Path(manifestDir(table), f"v${cur + 1}%06d.lock")
    // r11 lock protocol (the Delta LogStore putIfAbsent posture): the
    // version NUMBER is arbitrated FIRST by an exists-exclusive .lock
    // create — atomic per-scheme via createExclusive (r12: O_EXCL on
    // file://, where the Hadoop call is check-then-open). The
    // previous shape arbitrated on the marker AFTER the dir rename, and
    // two writers passing the exists-check together could interleave
    // renames (a bare dir rename silently moves INTO an existing
    // destination) and the marker loser's cleanup then deleted the
    // WINNER's placed manifest. With the lock held, the rename and the
    // marker are contention-free by construction; losers clean up only
    // their own tmp dir and retry at the next version. A crashed
    // holder's stale lock blocks its version number until vacuum
    // reclaims it — exactly the posture stale manifest dirs already had.
    try createExclusive(fs, lockFile)
    catch {
      // ONLY the exists-exclusive marker type means contention — a
      // permissions/disk-full/parent-create IOException is a fault the
      // caller must see as such, not retry 5 times (ADVICE r12)
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(mTmp, true)
        throw new CommitContention(
          s"commit of $table v${cur + 1} lost the version lock " +
            "(concurrent writer, or stale crash debris vacuum reclaims) — " +
            "re-read the current version and retry")
      case e: java.io.IOException =>
        fs.delete(mTmp, true)
        throw e
    }
    def releaseAndAbort(reason: String, contention: Boolean): Nothing = {
      fs.delete(mTmp, true)
      fs.delete(lockFile, false)
      val msg = s"commit of $table v${cur + 1} aborted: $reason"
      throw (if (contention) new CommitContention(msg)
             else new IllegalStateException(msg))
    }
    // a committed-and-vacuum-less past life of this version number (the
    // caller read a stale `cur`) or a crashed holder's dir: abort —
    // never rename into it. Contention-typed: a stale read means a
    // concurrent writer won, and re-reading + recomputing is the remedy.
    if (fs.exists(okFile) || fs.exists(target))
      releaseAndAbort("version already exists — stale current-version read",
        contention = true)
    if (!fs.rename(mTmp, target))
      releaseAndAbort("manifest rename failed", contention = false)
    // commit metadata and the recorded reader schema ride sidecars
    // written BEFORE the marker, so a committed version's meta/schema
    // are always complete once the marker exists (the idempotent-sink
    // and evolution-read contracts depend on that ordering)
    val metaFile = new Path(manifestDir(table), f"v${cur + 1}%06d.meta")
    if (meta.nonEmpty) {
      val out = fs.create(metaFile, true)
      out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    val schemaFile = new Path(manifestDir(table), f"v${cur + 1}%06d.schema")
    schema.foreach { st =>
      val out = fs.create(schemaFile, true)
      out.write(st.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    // COMMIT POINT — uncontended (we hold the lock and proved the
    // marker absent), so a failure here is an I/O fault, not a race:
    // roll back this writer's own artifacts and rethrow
    try createExclusive(fs, okFile)
    catch { case e: java.io.IOException =>
      fs.delete(target, true)
      fs.delete(metaFile, false)
      fs.delete(schemaFile, false)
      fs.delete(lockFile, false)
      throw new IllegalStateException(
        s"commit of $table v${cur + 1} could not place its marker", e)
    }
    fs.delete(lockFile, false)
  }

  /** Commit metadata of `version` ("" if none was recorded). */
  def commitMeta(spark: SparkSession, table: String, version: Long): String = {
    val p = new Path(manifestDir(table), f"v$version%06d.meta")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) ""
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
  }

  /** Exactly-once streaming sink: a `foreachBatch` function that commits
    * each micro-batch as one snapshot version stamped
    * `batch:<appId>:<id>`, and SKIPS a batch id at-or-below the one last
    * committed BY THE SAME appId — Structured Streaming replays the
    * in-flight batch on recovery, and this is the Delta txnAppId/
    * txnVersion guard that makes the replay a no-op instead of a
    * duplicate append. `appId` must be STABLE across restarts of the
    * same query (it is the query's identity, not the sink instance's —
    * a fresh UUID per restart would defeat the guard); distinct queries
    * writing one table use distinct appIds. The guard inspects only the
    * latest version's meta, which covers the recovery case (the replay
    * immediately follows its original commit) under the one-live-writer-
    * query-per-table discipline the optimistic manifest race already
    * implies. The meta sidecar lands before the atomic marker, so a
    * version visible to the guard always carries its stamp. Use as
    * `stream.writeStream.foreachBatch(Snapshots.batchSink(table, "q1"))`. */
  def batchSink(table: String, appId: String = "default",
                statsCol: Option[String] = None,
                clustered: Boolean = false, files: Int = 0)
               : (DataFrame, Long) => Unit = { (df, batchId) =>
    require(!appId.contains(":"), s"appId must not contain ':': $appId")
    val spark = df.sparkSession
    val cur = currentVersion(spark, table)
    val last = if (cur == 0) -1L else commitMeta(spark, table, cur) match {
      case s if s.startsWith(s"batch:$appId:") =>
        s.substring(s.lastIndexOf(':') + 1).toLong
      case _ => -1L
    }
    if (batchId > last)
      commit(spark, df, table, overwrite = false, statsCol = statsCol,
        clustered = clustered, files = files, meta = s"batch:$appId:$batchId")
  }

  private def filesOf(spark: SparkSession, table: String, v: Long): DataFrame =
    manifest(spark, table, v)
      .select(concat(lit(dataDir(table).toString + "/"), col("file")).as("path"))

  /** `schema`: the version's RECORDED reader schema — applied explicitly
    * so a membership that mixes file generations (post-`mergeSchema`
    * evolution) reads uniformly, with the added columns null for files
    * written before them. None (legacy tables) keeps footer inference. */
  private def readFiles(spark: SparkSession, paths: Seq[String],
                        schema: Option[StructType] = None): DataFrame = {
    require(paths.nonEmpty, "empty file set")
    schema match {
      case Some(st) =>
        // request the VISIBLE fields by their PHYSICAL names (dropped
        // columns are never decoded), then surface logical names
        val vis = visible(st)
        spark.read
          .schema(StructType(vis.fields.map(f => f.copy(name = physicalName(f)))))
          .parquet(paths: _*)
          .toDF(vis.fieldNames.toIndexedSeq: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** Snapshot read of `version` (default: latest) — exactly the files
    * that manifest lists, regardless of what later commits added, under
    * that version's recorded schema (time travel across an add-column
    * evolution reads each version the way it was committed). */
  def read(spark: SparkSession, table: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion(spark, table) else version
    require(v > 0, s"$table has no committed version")
    val paths = filesOf(spark, table, v).collect().map(_.getString(0))
    require(paths.length <= 1000000, "manifest not metadata-sized")
    if (paths.isEmpty) {
      // a zero-file version (zero-row overwrite = truncate, or an empty
      // first commit) serves an empty frame under its recorded schema —
      // r14 review: without this, such a commit published a version no
      // read could ever open (readFiles requires a nonempty file set)
      val st = readerSchema(spark, table, v).getOrElse(
        throw new IllegalStateException(
          s"$table v$v has no files and no recorded schema — nothing to infer from"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], visible(st))
    } else readFiles(spark, paths.toIndexedSeq, readerSchema(spark, table, v))
  }

  /** Manifest-pruned snapshot read: keep only files whose recorded
    * [min_k, max_k] overlaps [lo, hi] — whole-file skipping at a pinned
    * version (readPruned, now with time travel). Row-level filter still
    * applies; pruning is a strict optimization. */
  def readPruned(spark: SparkSession, table: String, c: String,
                 lo: Double, hi: Double, version: Long = -1L): DataFrame = {
    val v = if (version < 0) currentVersion(spark, table) else version
    val m = manifest(spark, table, v)
    require(hi >= lo, s"empty range [$lo, $hi]")
    // a file is skipped ONLY on positive evidence: stats recorded FOR
    // THIS column and provably disjoint from [lo, hi]. Files with no
    // stats (append without statsCol), another column's stats, or null
    // min/max (string-typed key whose cast-to-double is null) stay in
    // the scan — the row-level filter below still applies, keeping the
    // documented "strict optimization, never a semantics change"
    // contract (r11, advice fix: the old key===c && overlap filter
    // silently DROPPED every null-stats file)
    // key.isNotNull leads so the conjunction is FALSE (not NULL) on
    // null keys — `!NULL` would silently drop the row from the scan
    val disjoint = col("key").isNotNull && col("key") === c &&
      col("min_k").isNotNull && col("max_k").isNotNull &&
      (col("max_k") < lo || col("min_k") > hi)
    val keep = m.filter(!disjoint)
      .select(concat(lit(dataDir(table).toString + "/"), col("file")))
      .collect().map(_.getString(0))
    require(keep.length <= 1000000, "manifest not metadata-sized")
    if (keep.isEmpty) read(spark, table, v).filter(lit(false))
    else readFiles(spark, keep.toIndexedSeq, readerSchema(spark, table, v))
      .filter(col(c) >= lo && col(c) <= hi)
  }

  final case class DeleteStats(version: Long, filesRewritten: Long,
                               filesKept: Long, rowsDeleted: Long)

  /** Catalog-scoped DELETE — the third verb of the DML triad (append =
    * [[commit]], MERGE = [[upsert]], DELETE = this): remove every row
    * matching `pred` by REWRITING ONLY THE FILES THAT CONTAIN HITS;
    * untouched files carry over into the next manifest version by
    * reference (zero bytes moved), so the GDPR "forget this user" pass
    * costs O(files with hits), not O(table). Time travel still serves
    * the pre-delete versions until [[vacuum]] reclaims them — the
    * deletion is durable once vacuumed.
    *
    * Discovery: one column-pruned scan of the candidate files finds
    * which contain hits (`prune = Some((col, lo, hi))` first restricts
    * the candidates to files whose recorded stats FOR THAT COLUMN
    * provably overlap — pass the hash/cluster-key range covering the
    * delete key and discovery also skips the cold files; files with no
    * stats, null stats, or another column's stats are always
    * candidates, so pruning can never skip a matching row). Rewrite:
    * survivors of the hit files are re-clustered on the table's
    * recorded stats key, keeping later pruned reads intact. A DELETE
    * with no hits burns no version. Returns the new version and the
    * rewrite/keep/row accounting.
    */
  def delete(spark: SparkSession, table: String, pred: Column,
             prune: Option[(String, Double, Double)] = None,
             meta: String = ""): DeleteStats = {
    val cur = currentVersion(spark, table)
    require(cur > 0, s"$table has no committed version")
    val m = manifest(spark, table, cur)
    val dd = dataDir(table).toString
    // the current version's recorded schema rides through the rewrite
    // (mixed-generation candidate files read uniformly; DML never evolves)
    val sch = readerSchema(spark, table, cur)
    val keyCol = m.filter(col("key").isNotNull).select("key")
      .limit(1).collect().headOption.map(_.getString(0))
      // a stats key that was since dropped (or renamed — old manifests
      // keep the old name) no longer resolves on the logical frame:
      // rewrite unclustered rather than fail the DELETE on a dead name
      .filter(k => sch.forall(st => visible(st).fieldNames.contains(k)))
    val candidates = prune match {
      case Some((c, lo, hi)) =>
        // a file is skipped ONLY on positive evidence: stats recorded
        // FOR THE PRUNE COLUMN and provably disjoint from [lo, hi].
        // Null-stats rows (appends without statsCol, string keys whose
        // cast-to-double min/max is null) and files clustered on a
        // DIFFERENT column say nothing about c and stay candidates —
        // a delete that skipped them would silently leave matching
        // rows behind and report success (r11, advice fix; the spec
        // pins a GDPR forget on a mixed-stats table)
        // key.isNotNull leads so the conjunction is FALSE (not NULL)
        // on null keys — `!NULL` would silently drop the row
        val disjoint = col("key").isNotNull && col("key") === c &&
          col("min_k").isNotNull && col("max_k").isNotNull &&
          (col("max_k") < lo || col("min_k") > hi)
        m.filter(!disjoint).select("file").collect().map(_.getString(0))
      case None => m.select("file").collect().map(_.getString(0))
    }
    require(candidates.length <= 1000000, "manifest not metadata-sized")
    val hitFiles: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFiles(spark, candidates.map(f => s"$dd/$f").toIndexedSeq, sch)
        .filter(pred)
        .select(element_at(split(input_file_name(), "/"), -1).as("f"))
        .distinct().collect().map(_.getString(0)).toSet
    if (hitFiles.isEmpty)
      return DeleteStats(cur, 0L, m.count(), 0L)

    val hit = readFiles(spark, hitFiles.toSeq.sorted.map(f => s"$dd/$f"), sch)
    val hitRows = hit.count()
    val survivors = hit.filter(!pred)
    // survivors keep the table's clustering so stats-pruned reads stay
    // tight; file granularity mirrors the rewritten set
    val shaped = keyCol match {
      case Some(c) => survivors
        .repartitionByRange(hitFiles.size, col(c)).sortWithinPartitions(c)
      case None => survivors.repartition(hitFiles.size)
    }
    val fs = fsOf(spark, dataDir(table))
    val tmp = new Path(table, s"_commit_tmp_${java.util.UUID.randomUUID()}")
    toPhysical(shaped, sch).write.mode(SaveMode.ErrorIfExists).parquet(tmp.toString)
    val tmpParts = partFiles(fs, tmp)
    val newRows =
      if (tmpParts.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else statsRowsOf(readBack(spark, tmp, sch), keyCol).collect()
    val survivorRows = newRows.map(_.getLong(1)).sum
    tmpParts.foreach { p =>
      require(fs.rename(p, new Path(dataDir(table), p.getName)),
        s"rename $p failed")
    }
    fs.delete(tmp, true)
    val kept = m.filter(!col("file").isin(hitFiles.toSeq: _*))
    val full = kept.unionByName(spark.createDataFrame(
      java.util.Arrays.asList(newRows: _*), ManifestSchema))
    publishManifest(spark, table, cur, full, meta, sch)
    DeleteStats(cur + 1, hitFiles.size.toLong, kept.count(),
      hitRows - survivorRows)
  }

  final case class UpsertStats(version: Long, filesRewritten: Long,
                               rowsUpdated: Long, rowsInserted: Long)

  /** Catalog-scoped MERGE (upsert) — the second verb of the DML triad
    * (append = [[commit]], MERGE = this, DELETE = [[delete]]), the
    * versioned sibling of [[graft.sources.Sources.upsertClustered]]:
    * rows of `updates` whose `keyCol` matches an existing row REPLACE
    * it, the rest are INSERTED — by rewriting only the files that
    * contain matched keys (discovered by a stats-pruned scan + one
    * semi join; file names are captured at the scan so the join may
    * shuffle freely) and appending the remainder; untouched files carry
    * into the next manifest by reference. Assumes the upsertClustered
    * key contract: `keyCol` unique in both the snapshot and `updates`.
    *
    * WRITE-WRITE CONFLICTS (VERDICT r11 item 7): the rewrite is
    * computed against the current snapshot and published under the
    * v{N+1} lock. A writer that loses the lock — or read a version that
    * went stale while it rewrote — gets [[CommitContention]], re-reads
    * the NEW current version, recomputes the rewrite against it, and
    * republishes (bounded by `maxRetries`, jittered so symmetric racers
    * de-phase). Both racers' effects therefore land in the final
    * version even when their key ranges overlap — no lost update
    * (spec-pinned with two racing writers). Data files renamed by a
    * losing attempt are unreferenced orphans: invisible to every reader
    * and reclaimed by [[vacuum]], the same debris class as a crashed
    * writer's. Genuine I/O faults are NOT retried.
    */
  def upsert(spark: SparkSession, table: String, updates: DataFrame,
             keyCol: String, prune: Option[(String, Double, Double)] = None,
             meta: String = "", maxRetries: Int = 5): UpsertStats = {
    var attempt = 0
    while (true) {
      try return upsertOnce(spark, table, updates, keyCol, prune, meta)
      catch {
        case e: CommitContention =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(20L * attempt + (Thread.currentThread().getId & 31))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def upsertOnce(spark: SparkSession, table: String,
                         updates: DataFrame, keyCol: String,
                         prune: Option[(String, Double, Double)],
                         meta: String): UpsertStats = {
    val cur = currentVersion(spark, table)
    require(cur > 0, s"$table has no committed version")
    val m = manifest(spark, table, cur)
    val dd = dataDir(table).toString
    // recorded schema carried through the rewrite, as in [[delete]]
    val sch = readerSchema(spark, table, cur)
    // empty updates: no version burned, and neither the span job nor the
    // manifest collect below runs (r13 review: the old ordering paid both
    // and logged a misleading 'non-numeric values' warning on the way out)
    val upN = updates.count()
    if (upN == 0) return UpsertStats(cur, 0L, 0L, 0L)
    val statsKey = m.filter(col("key").isNotNull).select("key")
      .limit(1).collect().headOption.map(_.getString(0))
      // same dead-name guard as [[delete]]: a dropped/renamed stats key
      // must not fail the MERGE
      .filter(k => sch.forall(st => visible(st).fieldNames.contains(k)))
    val candidates = prune match {
      case Some((c, lo0, hi0)) =>
        // caller-supplied bounds are a pruning HINT, never trusted truth
        // (ADVICE r12): when the prune column IS the merge key, a range
        // narrower than the updates' actual key span would prune files
        // that contain matched keys — the stale row then survives beside
        // its inserted update, silently breaking the key-unique contract.
        // Widen to the measured span (and say so). For c != keyCol the
        // key→range mapping is caller-asserted and unverifiable here.
        val spanOpt =
          if (c == keyCol) {
            val span = updates.agg(
              min(expr(s"try_cast(`$keyCol` AS DOUBLE)")),
              max(expr(s"try_cast(`$keyCol` AS DOUBLE)")),
              sum(when(expr(s"try_cast(`$keyCol` AS DOUBLE)").isNull, 1L)
                .otherwise(0L))).head()
            // ANY non-numeric update key disables pruning outright: such
            // a key has no place on the [lo, hi] axis, and a file whose
            // OTHER keys are numeric still carries numeric min/max stats
            // (min/max skip nulls), so it could be pruned while holding
            // the non-numeric match — the stale-duplicate hole this
            // widening exists to close (r13 self-review; the old
            // null-span fallback assumed null stats everywhere, which is
            // false for mixed numeric/non-numeric key columns)
            if (span.isNullAt(0) || span.isNullAt(1) || span.getLong(2) > 0L) {
              System.err.println(
                s"[snapshots] merge prune disabled: updates' $keyCol has " +
                  "non-numeric values — every manifest file stays a candidate")
              None
            } else {
              val (wlo, whi) = (math.min(lo0, span.getDouble(0)),
                math.max(hi0, span.getDouble(1)))
              if (wlo < lo0 || whi > hi0) System.err.println(
                s"[snapshots] merge prune range [$lo0, $hi0] narrower than " +
                  s"updates' $keyCol span [${span.getDouble(0)}, " +
                  s"${span.getDouble(1)}] — widened to cover it")
              Some((wlo, whi))
            }
          } else Some((lo0, hi0))
        spanOpt match {
          case None => m.select("file").collect().map(_.getString(0))
          case Some((lo, hi)) =>
            // positive-evidence pruning only — identical contract to
            // [[delete]]'s (null/other-column stats stay candidates)
            val disjoint = col("key").isNotNull && col("key") === c &&
              col("min_k").isNotNull && col("max_k").isNotNull &&
              (col("max_k") < lo || col("min_k") > hi)
            m.filter(!disjoint).select("file").collect().map(_.getString(0))
        }
      case None => m.select("file").collect().map(_.getString(0))
    }
    require(candidates.length <= 1000000, "manifest not metadata-sized")
    val keys = updates.select(col(keyCol)).distinct()
    val hitFiles: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFiles(spark, candidates.map(f => s"$dd/$f").toIndexedSeq, sch)
        .select(col(keyCol),
          element_at(split(input_file_name(), "/"), -1).as("_src_file"))
        .join(keys, Seq(keyCol), "left_semi")
        .select("_src_file").distinct().collect().map(_.getString(0)).toSet
    val hit =
      if (hitFiles.isEmpty) None
      else Some(readFiles(spark, hitFiles.toSeq.sorted.map(f => s"$dd/$f"), sch))
    val hitRows = hit.map(_.count()).getOrElse(0L)
    val survivors = hit.map(_.join(keys, Seq(keyCol), "left_anti"))
    val merged = survivors match {
      case Some(sv) => sv.unionByName(updates.select(sv.columns.map(col): _*))
      case None => updates
    }
    val nFiles = math.max(1, hitFiles.size)
    val shaped = statsKey match {
      case Some(c) => merged
        .repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case None => merged.repartition(nFiles)
    }
    val fs = fsOf(spark, dataDir(table))
    val tmp = new Path(table, s"_commit_tmp_${java.util.UUID.randomUUID()}")
    toPhysical(shaped, sch).write.mode(SaveMode.ErrorIfExists).parquet(tmp.toString)
    val tmpParts = partFiles(fs, tmp)
    val newRows = statsRowsOf(readBack(spark, tmp, sch), statsKey).collect()
    val writtenRows = newRows.map(_.getLong(1)).sum
    tmpParts.foreach { p =>
      require(fs.rename(p, new Path(dataDir(table), p.getName)),
        s"rename $p failed")
    }
    fs.delete(tmp, true)
    val kept = m.filter(!col("file").isin(hitFiles.toSeq: _*))
    val full = kept.unionByName(spark.createDataFrame(
      java.util.Arrays.asList(newRows: _*), ManifestSchema))
    publishManifest(spark, table, cur, full, meta, sch)
    // written = survivors + ALL updates, so the matched count falls out
    // of the row accounting without an extra action
    val rowsUpdated = hitRows - (writtenRows - upN)
    UpsertStats(cur + 1, hitFiles.size.toLong, rowsUpdated, upN - rowsUpdated)
  }

  /** Current recorded schema of `table`, derived from a data-file footer
    * for legacy tables that predate schema sidecars — the shared entry
    * point of the two metadata-only DDL verbs below. */
  private def recordedOrFooter(spark: SparkSession, table: String,
                               v: Long): StructType =
    readerSchema(spark, table, v).getOrElse(read(spark, table, v).schema)

  /** Metadata-only column RENAME (Delta column-mapping parity, VERDICT
    * r13 item 5): the logical field name changes, the PHYSICAL parquet
    * column name is stamped in the field metadata, and one new manifest
    * version is published with the SAME file membership — zero data
    * files touched. Time travel keeps serving each version under its
    * own recorded name. The manifest's per-file stats rows are re-keyed
    * to the new name so [[readPruned]] on the renamed column keeps
    * pruning. Returns the new version. */
  def renameColumn(spark: SparkSession, table: String,
                   from: String, to: String, meta: String = ""): Long = {
    val cur = currentVersion(spark, table)
    require(cur > 0, s"$table has no committed version")
    val sch = recordedOrFooter(spark, table, cur)
    require(visible(sch).fieldNames.contains(from),
      s"$table has no column '$from' at v$cur")
    require(!visible(sch).fieldNames.contains(to),
      s"$table already has a column '$to' at v$cur")
    val next = StructType(sch.fields.map { f =>
      if (!isDropped(f) && f.name == from) {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
          .putString(PhysKey, physicalName(f)).build()
        f.copy(name = to, metadata = mb)
      } else f
    })
    val m = manifest(spark, table, cur).withColumn("key",
      when(col("key") === from, to).otherwise(col("key")))
    publishManifest(spark, table, cur, m, meta, Some(next))
    cur + 1
  }

  /** Metadata-only column DROP: the field is TOMBSTONED in the recorded
    * schema — readers stop requesting it (parquet never decodes the
    * column), no file is rewritten, and the tombstone keeps the physical
    * name reserved so a later mergeSchema re-add of the same name mints
    * a fresh physical name (old files' stale bytes read as null, never
    * as the new column). Time travel to any pre-drop version still
    * serves the column. Returns the new version. */
  def dropColumn(spark: SparkSession, table: String,
                 name: String, meta: String = ""): Long = {
    val cur = currentVersion(spark, table)
    require(cur > 0, s"$table has no committed version")
    val sch = recordedOrFooter(spark, table, cur)
    require(visible(sch).fieldNames.contains(name),
      s"$table has no column '$name' at v$cur")
    require(visible(sch).fields.length > 1,
      s"cannot drop the last visible column of $table")
    val next = StructType(sch.fields.map { f =>
      if (!isDropped(f) && f.name == name) {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
          .putString(PhysKey, physicalName(f))
          .putBoolean(DroppedKey, true).build()
        // reserved placeholder name keeps the logical namespace clean
        // for a later re-add of `name`
        f.copy(name = s"_dropped_${physicalName(f)}_v${cur + 1}",
          nullable = true, metadata = mb)
      } else f
    })
    publishManifest(spark, table, cur, manifest(spark, table, cur), meta,
      Some(next))
    cur + 1
  }

  /** Schema-drift report between two versions — the metadata half of
    * [[diff]]: columns added, removed, or retyped across an overwrite
    * reshape or a `mergeSchema` append (plain appends can't drift —
    * [[commit]] rejects them). Reads each side's recorded-schema sidecar
    * when present (after a mergeSchema append the membership mixes file
    * generations, so no single footer describes it) and falls back to
    * one parquet footer for legacy schema-uniform versions — metadata
    * cost either way. One row per drifted column: (column, change ∈
    * {added, removed, retyped}, from_type, to_type). */
  def schemaDrift(spark: SparkSession, table: String,
                  v0: Long, v1: Long): DataFrame = {
    import spark.implicits._
    // prefer the recorded sidecar: after a mergeSchema append, one file's
    // footer no longer describes the mixed membership
    def schemaAt(v: Long): Map[String, String] =
      readerSchema(spark, table, v) match {
        // reader-facing drift only: a tombstoned field reports as
        // `removed` at the version that dropped it, not as a rename to
        // its reserved placeholder
        case Some(st) => visible(st).map(f => f.name -> f.dataType.simpleString).toMap
        case None =>
          val one = filesOf(spark, table, v).limit(1).collect()
          require(one.nonEmpty, s"$table v$v has no files")
          spark.read.parquet(one.head.getString(0)).schema
            .map(f => f.name -> f.dataType.simpleString).toMap
      }
    val (s0, s1) = (schemaAt(v0), schemaAt(v1))
    val rows =
      (s1.keySet -- s0.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, s1(c))) ++
      (s0.keySet -- s1.keySet).toSeq.sorted.map(c =>
        (c, "removed", s0(c), null: String)) ++
      (s0.keySet & s1.keySet).toSeq.sorted.collect {
        case c if s0(c) != s1(c) => (c, "retyped", s0(c), s1(c))
      }
    rows.toDF("column", "change", "from_type", "to_type")
  }

  /** Row-level change feed between two versions from the manifest diff:
    * rows of files ADDED since v0 minus rows of files REMOVED since v0
    * are the inserts (multiset), and vice versa the deletes — rows in
    * unchanged files cancel WITHOUT BEING READ, so CDC cost scales with
    * the churn, not the table. Returns `_op` ∈ {insert, delete} ++ the
    * data columns. */
  def diff(spark: SparkSession, table: String, v0: Long, v1: Long): DataFrame = {
    val f0 = filesOf(spark, table, v0).collect().map(_.getString(0)).toSet
    val f1 = filesOf(spark, table, v1).collect().map(_.getString(0)).toSet
    require(f0.size <= 1000000 && f1.size <= 1000000, "manifest not metadata-sized")
    val added = (f1 -- f0).toSeq.sorted
    val removed = (f0 -- f1).toSeq.sorted
    // both sides read under v1's recorded schema: across an add-column
    // evolution, removed (pre-evolution) rows surface with the new
    // column null — one uniform CDC schema, the Delta posture
    val v1Schema = readerSchema(spark, table, v1)
    val schema = read(spark, table, v1).schema
    def side(paths: Seq[String]) =
      if (paths.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else readFiles(spark, paths, v1Schema)
    val ins = side(added).exceptAll(side(removed))
      .select(lit("insert").as("_op") +: schema.fieldNames.map(col): _*)
    val del = side(removed).exceptAll(side(added))
      .select(lit("delete").as("_op") +: schema.fieldNames.map(col): _*)
    ins.unionByName(del)
  }

  /** Drop every version but the last `keepLast`, then delete data files
    * no retained manifest references (including orphans from failed
    * commits). Returns (manifests dropped, data files deleted). Bounded
    * driver state: the retained membership and the data listing are
    * FILE-count-sized (require()d).
    *
    * `orphanMinAgeMs` (r11, the Delta/Iceberg vacuum retention posture):
    * an UNREFERENCED file or unmarked manifest dir/lock younger than the
    * threshold is left alone — it may belong to a commit that is
    * in-flight right now (data files renamed into `data/`, marker not
    * yet placed); deleting it would corrupt that commit the moment its
    * marker lands. Committed-version drops are not age-gated (their
    * markers prove them superseded). Pass 0 only when no writer can be
    * live (single-process tests, maintenance windows). */
  def vacuum(spark: SparkSession, table: String, keepLast: Int = 1,
             orphanMinAgeMs: Long = 600000L): (Int, Int) = {
    require(keepLast >= 1, "must retain at least one version")
    val now = System.currentTimeMillis
    val md = manifestDir(table)
    val fs = fsOf(spark, md)
    val versions = fs.listStatus(md)
      .flatMap(s => markerOf(s.getPath.getName)).sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.length - keepLast))
    val referenced = keep.flatMap { v =>
      val fsRows = manifest(spark, table, v).select("file").collect()
      require(fsRows.length <= 1000000, "manifest not metadata-sized")
      fsRows.map(_.getString(0))
    }.toSet
    drop.foreach { v =>
      fs.delete(new Path(md, f"v$v%06d.ok"), false)
      fs.delete(new Path(md, f"v$v%06d.meta"), false)
      fs.delete(new Path(md, f"v$v%06d.schema"), false)
      fs.delete(new Path(md, f"v$v%06d.lock"), false)
      fs.delete(new Path(md, f"v$v%06d"), true)
    }
    // stale manifest dirs/sidecars/locks a crashed writer left without a
    // marker block that version number forever — reclaim them once they
    // are old enough to be provably not in-flight
    fs.listStatus(md)
      .filter { st =>
        val base = st.getPath.getName.stripSuffix(".meta")
          .stripSuffix(".schema").stripSuffix(".lock")
        base.matches("v\\d{6}") && !fs.exists(new Path(md, base + ".ok")) &&
          now - st.getModificationTime >= orphanMinAgeMs
      }
      .foreach(st => fs.delete(st.getPath, true))
    val dd = dataDir(table)
    val onDisk = fs.listStatus(dd)
      .filter(_.getPath.getName.endsWith(".parquet"))
    require(onDisk.length <= 1000000, "data dir not file-count bounded")
    val orphans = onDisk.filter(st =>
      !referenced(st.getPath.getName) &&
        now - st.getModificationTime >= orphanMinAgeMs)
    orphans.foreach(st => fs.delete(st.getPath, false))
    (drop.length, orphans.length)
  }
}
