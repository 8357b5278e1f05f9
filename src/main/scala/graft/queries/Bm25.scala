package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared Okapi BM25 scoring arm (Robertson & Zaragoza 2009; k1=1.2,
  * b=0.75, BM25+ positive idf) used by q79 (ranked retrieval) and q85's
  * lexical arm (hybrid RRF) — ONE implementation of the arithmetic, in
  * both the Spark and the DuckDB spelling, so the two queries cannot
  * drift apart.
  *
  * Determinism contract (q79's): tf is pivoted to columns by a
  * conditional hash-agg and the per-doc score is summed in FIXED textual
  * order (s1 + s2 + s3), so both engines run the same IEEE op sequence on
  * the same integers — bit-equal doubles. Scale shape: one explode into a
  * map-side-combinable hash-agg (3 int columns per doc), broadcast 1-row
  * stats frames, no windows.
  */
private[graft] object Bm25 {

  /** the fixed declared query, in scoring order. */
  val qterms: Seq[String] = Seq("data", "join", "stream")

  /** One term's BM25 contribution from columns `tf$i`/`df$i`/`n`/`avgdl`/
    * `dl` — THE arithmetic, shared verbatim by the corpus-scan arm below
    * and the postings-index serve path ([[graft.pipeline.TextIndex]]), so
    * index-served scores are bit-equal to scan-computed ones. */
  def termScore(i: Int): Column = {
    val tfD = col(s"tf$i").cast("double")
    val dfD = col(s"df$i").cast("double")
    val idf = log(lit(1.0) + (col("n").cast("double") - dfD + 0.5) / (dfD + 0.5))
    idf * (tfD * lit(2.2) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
  }

  /** (doc_id, score) for every document — the Spark arm. */
  def scored(s: SparkSession, d: String): DataFrame = {
    val words: Column = split(col("text"), " ")
    val terms = Tables.documents(s, d)
      .select(col("doc_id"), explode(words).as("term"))
    val tf = terms.groupBy("doc_id").agg(
      sum(when(col("term") === qterms(0), 1).otherwise(0)).as("tf1"),
      sum(when(col("term") === qterms(1), 1).otherwise(0)).as("tf2"),
      sum(when(col("term") === qterms(2), 1).otherwise(0)).as("tf3"))
    val dl = Tables.documents(s, d)
      .select(col("doc_id"), size(words).cast("long").as("dl"))
    val g = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val dfreq = tf.agg(
      sum(when(col("tf1") > 0, 1).otherwise(0)).as("df1"),
      sum(when(col("tf2") > 0, 1).otherwise(0)).as("df2"),
      sum(when(col("tf3") > 0, 1).otherwise(0)).as("df3"))
    tf.join(dl, "doc_id")
      .crossJoin(broadcast(g)).crossJoin(broadcast(dfreq))
      .select(col("doc_id"),
        (termScore(1) + termScore(2) + termScore(3)).as("score"))
  }

  private def sqlTf(t: String) = s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END)"

  private def sqlScore(i: Int) =
    s"""ln(1.0 + (CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
       | * (CAST(tf$i AS DOUBLE) * 2.2
       |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin

  /** The DuckDB twin: CTEs `tf`, `d`, `g`, `df`, `scored` (doc_id, score)
    * — splice after `WITH ` and build the consumer query on `scored`. */
  val sqlCtes: String =
    s"""t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id,
       |              ${qterms.zipWithIndex.map { case (t, i) => s"${sqlTf(t)} AS tf${i + 1}" }.mkString(", ")}
       |       FROM t GROUP BY doc_id),
       |d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |g AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM d),
       |df AS (SELECT ${qterms.indices.map(i => s"SUM(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS df${i + 1}").mkString(", ")}
       |       FROM tf),
       |scored AS (
       |  SELECT tf.doc_id,
       |         ${qterms.indices.map(i => s"(${sqlScore(i + 1)})").mkString("\n         + ")} AS score
       |  FROM tf JOIN d USING (doc_id) CROSS JOIN g CROSS JOIN df)""".stripMargin
}
