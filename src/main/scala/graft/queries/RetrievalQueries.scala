package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval (X49): reciprocal-rank fusion of a lexical arm (q79's
  * BM25) and a semantic arm (q25's cosine ranking) — the standard
  * two-tower RAG retrieval pattern (Cormack et al. 2009 for RRF;
  * k=60 is the published constant). Declared here because it COMPOSES
  * two existing machineries end-to-end: the corpus is ranked by both
  * arms, each arm keeps its top-50, and fused candidates score
  * `Σ 1/(60+rank)` over the arms that retrieved them.
  */
object RetrievalQueries {

  private val armK = 50 // per-arm candidate depth
  private val rrfK = 60 // Cormack et al.'s constant

  // ---------------------------------------------------------------- Q85
  /** X49: RRF hybrid retrieval — BM25 arm over `documents` (q79's exact
    * scoring), cosine arm over `embeddings` (query = vec 0's embedding,
    * q25's exact arithmetic), top-50 each, fused by reciprocal rank.
    *
    * Determinism: ranks are integers from fully tie-broken orderings
    * (score desc, id); the fused score is two exact divisions summed in
    * fixed order — identical IEEE sequence in both engines. Scale shape:
    * each arm is its declared query's plan (hash-aggs + broadcast stats;
    * TakeOrdered for the top-50 — no corpus-wide sort), the fusion is a
    * 50∪50-row full-outer join, and every rank window runs on an
    * arm-bounded frame (onePartition — the plan-audit rule). */
  val q85 = {
    DeclaredQuery(
      "q85_hybrid_rrf",
      Some(s"""WITH ${Bm25.sqlCtes},
              |lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
              |        FROM scored QUALIFY lex_rank <= $armK),
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
              |qv AS (SELECT v AS pv, nrm AS pnrm FROM nn WHERE vec_id = 0),
              |cosv AS (SELECT vec_id, list_dot_product(v, pv)/(nrm*pnrm) AS cosine
              |         FROM nn CROSS JOIN qv WHERE vec_id <> 0),
              |sem AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INTEGER) AS sem_rank
              |        FROM cosv QUALIFY sem_rank <= $armK),
              |fused AS (
              |  SELECT COALESCE(lex.doc_id, sem.vec_id) AS doc_id, lex.lex_rank, sem.sem_rank,
              |         COALESCE(1.0 / CAST($rrfK + lex.lex_rank AS DOUBLE), 0.0)
              |         + COALESCE(1.0 / CAST($rrfK + sem.sem_rank AS DOUBLE), 0.0) AS rrf
              |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.vec_id),
              |top AS (SELECT doc_id, lex_rank, sem_rank, rrf,
              |               CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS rnk
              |        FROM fused QUALIFY rnk <= 10)
              |SELECT rnk, doc_id, lex_rank, sem_rank, rrf
              |FROM top ORDER BY rnk""".stripMargin)) { (s, dd) =>
      import graft.operators.Ranks.onePartition

      // lexical arm: the SHARED Bm25 scorer — one implementation with q79
      val lex = Bm25.scored(s, dd)
        .orderBy(col("score").desc, col("doc_id")).limit(armK)
        .withColumn("lex_rank", row_number().over(Window
          .partitionBy(onePartition(col("doc_id")))
          .orderBy(col("score").desc, col("doc_id"))).cast("int"))
        .select(col("doc_id"), col("lex_rank"))

      // ----------------------------------------------- semantic arm (q25)
      val nn = VectorQueries.normed(s, dd)
      val qv = nn.filter(col("vec_id") === 0)
        .select(col("v").as("pv"), col("nrm").as("pnrm"))
      val cosv = nn.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cosine",
          VectorQueries.dot(col("v"), col("pv")) / (col("nrm") * col("pnrm")))
      val sem = cosv.orderBy(col("cosine").desc, col("vec_id")).limit(armK)
        .withColumn("sem_rank", row_number().over(Window
          .partitionBy(onePartition(col("vec_id")))
          .orderBy(col("cosine").desc, col("vec_id"))).cast("int"))
        .select(col("vec_id"), col("sem_rank"))

      // --------------------------------------------------------- fusion
      val fused = lex.join(sem, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
          col("lex_rank"), col("sem_rank"))
        .withColumn("rrf",
          coalesce(lit(1.0) / (col("lex_rank") + rrfK).cast("double"), lit(0.0))
            + coalesce(lit(1.0) / (col("sem_rank") + rrfK).cast("double"), lit(0.0)))
      fused.orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .withColumn("rnk", row_number().over(Window
          .partitionBy(onePartition(col("doc_id")))
          .orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
        .select(col("rnk"), col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
        .orderBy("rnk")
    }
  }

  val all: Seq[DeclaredQuery] = Seq(q85)
}
