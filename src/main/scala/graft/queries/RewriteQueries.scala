package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus REWRITE operators — dedup decisions applied back to the text
  * itself, not just verdict flags. The reference recipe is C4 (Raffel
  * et al. 2020): occurrences of a span seen earlier in the corpus are
  * REMOVED from the document and the remainder is kept, so boilerplate
  * repeated across pages disappears while each document survives.
  */
object RewriteQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** span width in words; C4 uses three-sentence spans — the synthetic
    * corpus has no sentence marks, so disjoint 3-WORD windows stand in
    * (the operator is the same for any spanizer). */
  private val SpanWords = 3

  /** keeper encoding: doc_id·Stride + pos picks the minimum (doc, pos)
    * occurrence with plain integer MIN in both engines — no struct-min
    * aggregate (which falls back to SortAggregate in Spark) and no
    * engine-specific arg_min. Positions are bounded by text length / 3
    * ≪ Stride. */
  private val PosStride = 1000000L

  // ---------------------------------------------------------------- Q91
  /** Global span dedup with rewrite: each document's disjoint 3-word
    * spans; a span occurrence is REMOVED when the same span string
    * occurred earlier (smaller doc_id, or earlier position in the same
    * document); kept spans reassemble in order. Emits per document the
    * span counts and the CLEANED TEXT (fully-removed documents come
    * back as the empty string — the caller's drop-or-keep policy, not
    * this operator's).
    *
    * Scale shape (100 TB): one span explode → span-keyed integer-MIN
    * hash-agg (first occurrence; map-side combinable) → span-keyed join
    * back (both sides hash-partitioned on span) → doc-keyed reassembly
    * whose per-group state is ONE document's spans (sort_array over
    * ≤ len/3 elements — bounded like the tensor collects). No windows,
    * no driver state. */
  val q91 = DeclaredQuery(
    "q91_span_dedup_rewrite",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            |sp AS (SELECT doc_id, CAST(j AS BIGINT) AS pos,
            |              array_to_string(ws[CAST(j * $SpanWords + 1 AS INTEGER):
            |                                 CAST(j * $SpanWords + $SpanWords AS INTEGER)], ' ') AS span
            |       FROM (SELECT doc_id, ws,
            |                    unnest(range(0, (len(ws) + ${SpanWords - 1}) // $SpanWords)) AS j
            |             FROM t)),
            |k AS (SELECT span, MIN(doc_id * $PosStride + pos) AS kk FROM sp GROUP BY span),
            |v AS (SELECT sp.doc_id, sp.pos, sp.span,
            |             sp.doc_id * $PosStride + sp.pos = k.kk AS kept
            |      FROM sp JOIN k USING (span))
            |SELECT doc_id,
            |       CAST(COUNT(*) AS INTEGER) AS n_spans,
            |       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS INTEGER) AS n_removed,
            |       COALESCE(string_agg(CASE WHEN kept THEN span END, ' ' ORDER BY pos), '') AS cleaned_text
            |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val sp = t.select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          expr(s"(size(ws) + ${SpanWords - 1}) DIV $SpanWords - 1").cast("int")),
        j => concat_ws(" ", slice(col("ws"), j * SpanWords + 1, lit(SpanWords))))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("span"))
    val k = sp.groupBy("span")
      .agg(min(col("doc_id") * PosStride + col("pos")).as("kk"))
    sp.join(k, "span")
      .withColumn("kept", col("doc_id") * PosStride + col("pos") === col("kk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(when(col("kept"), 0).otherwise(1)).cast("int").as("n_removed"),
        concat_ws(" ", transform(filter(
            sort_array(collect_list(struct(col("pos"), col("kept"), col("span")))),
            x => x("kept")),
          x => x("span"))).as("cleaned_text"))
      .orderBy("doc_id")
  }

  val all: Seq[DeclaredQuery] = Seq(q91)
}
