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
