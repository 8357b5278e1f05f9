package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Data-layout maintenance: clustered writes give disjoint per-file key
  * ranges (the min/max file-skipping contract) and compaction preserves
  * rows while bounding file count. */
class LayoutSpec extends SparkSpec {

  test("writeClustered produces disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("clustered").toString + "/t"
    val df = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    Sources.writeClustered(df, dir, "doc_id", files = 4)

    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    val ranges = back.select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4, s"expected 4 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $ranges")
      case _ =>
    }

    // ...and a key-range probe pushes its predicate to the scan, where
    // the disjoint per-file/row-group stats make the skipping effective
    val (lo, hi) = ranges.head
    val probe = spark.read.parquet(dir).filter(col("doc_id").between(lo, hi))
    val scanStr = probe.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanStr.contains("GreaterThanOrEqual(doc_id") &&
      scanStr.contains("LessThanOrEqual(doc_id"),
      s"range predicate not pushed to the scan:\n$scanStr")
  }

  test("hive-partitioned writes prune partitions at the scan") {
    val dir = Files.createTempDirectory("parts").toString + "/t"
    Tables.documents(spark, sf0001)
      .withColumn("part", pmod(col("doc_id"), lit(8)))
      .write.partitionBy("part").parquet(dir)
    val all = spark.read.parquet(dir)
    val probe = all.filter(col("part") === 3)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(scan.toString.contains("PartitionFilters: [isnotnull(part"),
      s"partition filter missing from the scan:\n$scan")
    val totalFiles = { all.collect(); all.queryExecution.executedPlan
      .collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get }
    assert(scan.metrics("numFiles").value < totalFiles,
      s"pruned scan read all $totalFiles files")
  }

  test("z-ordered writes skip files on EVERY cluster column") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    // two near-independent numeric dimensions: doc_id and a shuffled twin
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), xxhash64(col("doc_id")).as("h"), col("n_chars"))
    Sources.writeZOrdered(df, dir, Seq("doc_id", "h"), files = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    assert(back.agg(expr("bit_xor(xxhash64(doc_id, h))")).head().getLong(0)
      == df.agg(expr("bit_xor(xxhash64(doc_id, h))")).head().getLong(0))

    val cat = Sources.statsCatalog(spark, dir, Seq("doc_id", "h")).collect()
    assert(cat.length == 16)
    // a narrow range on EITHER dimension overlaps only a minority of
    // files — the property a 1-D sort can deliver for one column only
    def overlapping(c: String, lo: Long, hi: Long): Int = {
      val iMin = cat.head.schema.fieldIndex(s"min_$c")
      val iMax = cat.head.schema.fieldIndex(s"max_$c")
      cat.count(r => r.getLong(iMax) >= lo && r.getLong(iMin) <= hi)
    }
    val ids = df.select(min("doc_id"), max("doc_id")).head()
    val (idLo, idHi) = (ids.getLong(0), ids.getLong(1))
    val idSpan = (idHi - idLo) / 8
    val hs = df.select(min("h"), max("h")).head()
    val hSpan = (hs.getLong(1) / 8) - (hs.getLong(0) / 8) // avoid overflow
    val nId = overlapping("doc_id", idLo, idLo + idSpan)
    val nH = overlapping("h", hs.getLong(0), hs.getLong(0) + hSpan)
    assert(nId <= 8, s"doc_id octant range touched $nId/16 files")
    assert(nH <= 8, s"h octant range touched $nH/16 files")
  }

  test("catalog-pruned read scans fewer files and matches the full scan") {
    val dir = Files.createTempDirectory("catalog").toString + "/t"
    val df = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    Sources.writeClustered(df, dir, "doc_id", files = 8)
    val catalog = Sources.statsCatalog(spark, dir, Seq("doc_id"))
    val (lo, hi) = (100L, 300L)
    val pruned = Sources.readPruned(spark, dir, catalog, "doc_id", lo, hi)
    val full = spark.read.parquet(dir).filter(col("doc_id").between(lo, hi))
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.select(sum("n_chars")).head().getLong(0)
      == full.select(sum("n_chars")).head().getLong(0))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length
    }.get
    assert(scanned < 8, s"pruned read still lists $scanned/8 files")
    // empty-range prune keeps the schema
    val none = Sources.readPruned(spark, dir, catalog, "doc_id", -10L, -5L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "n_chars"))
  }

  test("upsertClustered rewrites only the touched key ranges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    val df = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    Sources.writeClustered(df, dir, "doc_id", files = 8)
    def names() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = names()
    assert(before.size == 8)
    val maxId = df.agg(max("doc_id")).head().getLong(0)
    // touch one narrow existing range + append keys beyond every range
    val updates = ((100L to 120L).map(id => (id, -1L)) ++
      (maxId + 1 to maxId + 3).map(id => (id, -2L))).toDF("doc_id", "n_chars")
    val stats = Sources.upsertClustered(spark, dir, updates, "doc_id")
    val after = names()
    assert(stats.filesTotal == 8)
    assert(stats.filesRewritten >= 1 && stats.filesRewritten < 8,
      s"expected a scoped rewrite, got $stats")
    assert(stats.filesAppended == 1)
    // untouched files survive BY NAME — they were never read or rewritten
    assert(before.intersect(after).size == 8 - stats.filesRewritten)
    // contents equal the logical MERGE
    val expected = df.filter(!col("doc_id").between(100L, 120L))
      .unionByName(updates)
    val back = spark.read.parquet(dir)
    assert(back.count() == expected.count())
    assert(back.agg(expr("bit_xor(xxhash64(doc_id, n_chars))")).head().getLong(0)
      == expected.agg(expr("bit_xor(xxhash64(doc_id, n_chars))")).head().getLong(0))
    assert(back.filter(col("n_chars") === -1L).count() == 21)
    assert(back.filter(col("n_chars") === -2L).count() == 3)
  }

  test("readEvolved unions schemas across file generations") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    // generation 1: (doc_id, n_chars); generation 2 adds lang
    Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
      .write.parquet(dir)
    Seq((3L, 30L, "en"), (4L, 40L, "de")).toDF("doc_id", "n_chars", "lang")
      .write.mode("append").parquet(dir)
    val df = Sources.readEvolved(spark, dir)
    assert(df.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(df.count() == 4)
    val byId = df.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        Option(r.getAs[String]("lang"))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty,
      "old-generation rows must read the new column as NULL")
    assert(byId(3L).contains("en") && byId(4L).contains("de"))
  }

  test("readTolerant survives a truncated file; the plain read fails") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tolerant").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text").write.parquet(dir)
    // a crashed writer's leftover: parquet magic + garbage, no footer
    Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      ("PAR1" + "x" * 64).getBytes("UTF-8"))
    val clean = Sources.readTolerant(spark, dir)
    assert(clean.count() == 2)
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
  }

  test("compact merges small files and preserves every row") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = Tables.documents(spark, sf0001)
    df.repartition(37).write.parquet(dir) // spray small files
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 37)
    val checksum = df.agg(expr("bit_xor(xxhash64(doc_id, text))")).head().getLong(0)

    val n = Sources.compact(spark, dir, targetBytes = 1L << 20)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == n && after < before, s"files: $before -> $after (target $n)")
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    assert(back.agg(expr("bit_xor(xxhash64(doc_id, text))")).head().getLong(0) == checksum)
  }
}
