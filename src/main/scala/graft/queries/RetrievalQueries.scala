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
              |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e WHERE list_dot_product(v, v) > 0),
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

  // ---------------------------------------------------------------- Q105
  /** X69: retrieval evaluation — NDCG@10 of the BM25 ranking against a
    * deterministic relevance labeling (rel = 3 for doc_id ≡ 0 mod 7,
    * 1 for ≡ 0 mod 3, else 0 — the synthetic qrels). The eval-harness
    * primitive every retrieval pipeline runs beside its index
    * (Järvelin & Kekäläinen 2002).
    *
    * Determinism: the ranking inherits q79's bit-equal scores; rank
    * positions come from a fully tie-broken ordering; the DCG is summed
    * in FIXED textual order over rank-pivoted rel columns (never a
    * float hash-agg), and the ideal DCG is derived ARITHMETICALLY from
    * the corpus's rel-class counts (rel_i = 3 while i ≤ n3, then 1
    * while i ≤ n3+n1) — no corpus-sized collect, no windows beyond the
    * 10-row onePartition rank. log2 spelled ln(x)/ln(2) in both
    * engines; the 6-decimal compare absorbs libm ulp. */
  val q105 = {
    val evalK = 10
    def sqlRel(c: String) =
      s"CASE WHEN $c % 7 = 0 THEN 3 WHEN $c % 3 = 0 THEN 1 ELSE 0 END"
    def sqlDisc(i: Int) = s"(ln(CAST(${i + 1} AS DOUBLE)) / ln(2.0))"
    val sqlDcg = (1 to evalK)
      .map(i => s"(POWER(2.0, rel$i) - 1.0) / ${sqlDisc(i)}").mkString("\n      + ")
    val sqlIdcg = (1 to evalK)
      .map(i => s"(POWER(2.0, CASE WHEN $i <= n3 THEN 3 WHEN $i <= n3 + n1 THEN 1 ELSE 0 END) - 1.0) / ${sqlDisc(i)}")
      .mkString("\n      + ")
    DeclaredQuery(
      "q105_ndcg",
      Some(s"""WITH ${Bm25.sqlCtes},
              |r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rk
              |      FROM scored QUALIFY rk <= $evalK),
              |p AS (SELECT ${(1 to evalK).map(i =>
                       s"MAX(CASE WHEN rk = $i THEN ${sqlRel("doc_id")} END) AS rel$i").mkString(",\n             ")}
              |      FROM r),
              |c AS (SELECT SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS n3,
              |             SUM(CASE WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN 1 ELSE 0 END) AS n1
              |      FROM documents),
              |fin AS (SELECT ($sqlDcg) AS dcg, ($sqlIdcg) AS idcg FROM p, c)
              |SELECT dcg, idcg, dcg / idcg AS ndcg FROM fin""".stripMargin)) { (s, d) =>
      val rel = when(col("doc_id") % 7 === 0, 3)
        .when(col("doc_id") % 3 === 0, 1).otherwise(0)
      val top = Bm25.scored(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(evalK)
        .withColumn("rk", row_number().over(
          Window.partitionBy(graft.operators.Ranks.onePartition(col("doc_id")))
            .orderBy(col("score").desc, col("doc_id"))))
        .withColumn("rel", rel)
      val p = top.agg(
        max(when(col("rk") === 1, col("rel"))).as("rel1"),
        (2 to evalK).map(i =>
          max(when(col("rk") === i, col("rel"))).as(s"rel$i")): _*)
      val c = Tables.documents(s, d).agg(
        sum(when(col("doc_id") % 7 === 0, 1).otherwise(0)).as("n3"),
        sum(when(col("doc_id") % 7 =!= 0 && col("doc_id") % 3 === 0, 1)
          .otherwise(0)).as("n1"))
      def disc(i: Int): Column = log(lit((i + 1).toDouble)) / log(lit(2.0))
      val dcg = (1 to evalK).map(i =>
        (pow(lit(2.0), col(s"rel$i")) - 1.0) / disc(i)).reduce(_ + _)
      val idcg = (1 to evalK).map { i =>
        val idealRel = when(lit(i) <= col("n3"), 3)
          .when(lit(i) <= col("n3") + col("n1"), 1).otherwise(0)
        (pow(lit(2.0), idealRel) - 1.0) / disc(i)
      }.reduce(_ + _)
      p.crossJoin(broadcast(c))
        .select(dcg.as("dcg"), idcg.as("idcg"))
        .select(col("dcg"), col("idcg"), (col("dcg") / col("idcg")).as("ndcg"))
    }
  }

  val all: Seq[DeclaredQuery] = Seq(q85, q105)
}
