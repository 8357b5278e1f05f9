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
}
