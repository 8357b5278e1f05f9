package graft.pipeline

import graft.queries.Bm25
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted index — the LEXICAL twin of [[AnnIndex]]'s
  * build-once/serve-many lifecycle: q79 re-derives postings from the
  * corpus on every query by declared contract; a deployment builds the
  * index once and serves every query from it without touching raw text
  * again.
  *
  * Layout under `dir`:
  *  - `postings/` — (term, doc_id, tf), range-CLUSTERED by term
  *    ([[Sources.writeClustered]]) so a query's `term IN (...)` filter is
  *    scan-pushed onto disjoint per-file term ranges → row-group/file
  *    skipping; at catalog scale, [[Sources.statsCatalog]] +
  *    [[Sources.readPruned]] lift that to whole-file pruning.
  *  - `dfs/` — (term, df), same clustering.
  *  - `doclens/` — (doc_id, dl).
  *  - `stats/` — one row (n, avgdl).
  *
  * Serving reuses [[Bm25.termScore]] VERBATIM with query terms pivoted
  * to columns in textual order (the q79 determinism contract), so an
  * index-served score is bit-equal to the scan-computed one —
  * TextIndexSpec pins top-k equality including the double bits.
  *
  * Scale shape: build = one explode → two hash-aggs + clustered writes;
  * serve = a term-pushed postings scan, one doc-keyed hash-agg over
  * ≤|query| rows per doc, two 1-row broadcasts, TakeOrdered. The only
  * collects are |query|-bounded (per-term dfs) and the 1-row stats. */
object TextIndex {

  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val words = split(col("text"), " ")
    val terms = docs.select(col("doc_id"), explode(words).as("term"))
    val postings = terms.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    Sources.writeClustered(postings, s"$dir/postings", "term", files = 16)
    Sources.writeClustered(
      postings.groupBy("term").agg(count(lit(1)).as("df")),
      s"$dir/dfs", "term", files = 4)
    val dl = docs.select(col("doc_id"), size(words).cast("long").as("dl"))
    dl.write.mode("overwrite").parquet(s"$dir/doclens")
    dl.agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Ingest new documents WITHOUT rebuilding: their postings append as
    * new files (term-sorted within, but term ranges now OVERLAP the
    * existing files' — skipping degrades from disjoint-range to
    * per-file-stats until the next [[Sources.compact]]/re-cluster pass;
    * correctness is unaffected), while dfs/doclens/stats — the tiny
    * frames — rebuild exactly from old + new. The [[AnnIndex]]
    * append-without-retrain posture, lexical edition: TextIndexSpec pins
    * post-append search bit-equal to a from-scratch rebuild. Assumes
    * `docs` holds only NEW doc_ids (the ingest-dedup verdict upstream,
    * pipeline/CorpusDedup.incremental, guarantees this). */
  def append(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val words = split(col("text"), " ")
    val terms = docs.select(col("doc_id"), explode(words).as("term"))
    terms.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .repartitionByRange(4, col("term")).sortWithinPartitions("term")
      .write.mode("append").parquet(s"$dir/postings")
    docs.select(col("doc_id"), size(words).cast("long").as("dl"))
      .write.mode("append").parquet(s"$dir/doclens")
    val dl = spark.read.parquet(s"$dir/doclens")
    // tiny frames rebuild exactly (dfs from the merged postings, stats
    // from merged doclens) — collect-free aggregates, overwrite in place
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      .collect()(0) // 1 row; materialized BEFORE the overwrite below
    spark.createDataFrame(
        java.util.Arrays.asList(stats),
        spark.read.parquet(s"$dir/stats").schema)
      .write.mode("overwrite").parquet(s"$dir/stats")
    val dfRows = spark.read.parquet(s"$dir/postings")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tmp = s"$dir/dfs_tmp"
    Sources.writeClustered(dfRows, tmp, "term", files = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/dfs"), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$dir/dfs")), "dfs swap failed")
  }

  /** Top-`k` (doc_id, score) for `qterms`, scores bit-equal to the
    * corpus-scan arm's. Ties break on doc_id ascending (q79's rule). */
  def search(spark: SparkSession, dir: String, qterms: Seq[String],
             k: Int): DataFrame = {
    require(qterms.nonEmpty && qterms.size <= 64,
      s"query wants 1-64 terms, got ${qterms.size}")
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(qterms: _*))
    // pivot to tf1..tfk in TEXTUAL order — the fixed-op-sequence contract
    val tf = post.groupBy("doc_id").agg(
      sum(when(col("term") === qterms.head, col("tf")).otherwise(0L)).as("tf1"),
      qterms.zipWithIndex.tail.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf${i + 1}")
      }: _*)
    // |query|-bounded collect: per-term document frequencies
    val dfByTerm = spark.read.parquet(s"$dir/dfs")
      .filter(col("term").isin(qterms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfs = qterms.zipWithIndex.foldLeft(spark.range(1).select(lit(1).as("one"))) {
      case (acc, (t, i)) => acc.withColumn(s"df${i + 1}", lit(dfByTerm.getOrElse(t, 0L)))
    }.drop("one")
    val score = qterms.indices.map(i => Bm25.termScore(i + 1)).reduce(_ + _)
    tf.join(spark.read.parquet(s"$dir/doclens"), "doc_id")
      .crossJoin(broadcast(spark.read.parquet(s"$dir/stats")))
      .crossJoin(broadcast(dfs))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
