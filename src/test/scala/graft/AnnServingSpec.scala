package graft

import graft.queries.AnnServing
import org.apache.spark.sql.functions._

/** Correctness pins for the production-knob ANN module (AnnServing):
  * degenerate knob settings must reduce to EXACT search, so the
  * approximation error measured by tools/AnnRecall is attributable to
  * the knobs alone, never to a broken serving plan. */
class AnnServingSpec extends SparkSpec {

  private def exactTop5(metric: String): Map[(Long, Long), Int] = {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pr = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val scored = e.crossJoin(broadcast(pr)).filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score",
        if (metric == "l2")
          aggregate(zip_with(col("v"), col("pv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x)
        else
          aggregate(zip_with(col("v"), col("pv"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
            / (sqrt(aggregate(transform(col("v"), a => a * a), lit(0.0), (acc, x) => acc + x))
              * sqrt(aggregate(transform(col("pv"), a => a * a), lit(0.0), (acc, x) => acc + x))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
      .orderBy(if (metric == "l2") col("score").asc else col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("probe_id", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
  }

  test("ivfTopK probing every cell IS exact cosine search") {
    val got = AnnServing.ivfTopK(spark, sf0001, nClusters = 8, nprobe = 8, iters = 1)
      .select("probe_id", "neighbor_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.keySet == exactTop5("cosine").keySet)
  }

  test("pqAdcRerankTopK with corpus-wide shortlist IS exact L2 search") {
    val n = Tables.embeddings(spark, sf0001).count().toInt
    val got = AnnServing.pqAdcRerankTopK(spark, sf0001, m = 4, k = 8,
      iters = 1, shortlist = n, topK = 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5("l2").keySet)
  }

  test("ivfPqTopK probing every cell with corpus-wide shortlist IS exact L2 search") {
    val n = Tables.embeddings(spark, sf0001).count().toInt
    val got = AnnServing.ivfPqTopK(spark, sf0001, nClusters = 4, nprobe = 4,
      m = 4, k = 8, iters = 1, shortlist = n, topK = 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5("l2").keySet)
  }

  test("AnnIndex: build persists cell-partitioned codes; search with full knobs IS exact; no retraining at serve time") {
    val dir = java.nio.file.Files.createTempDirectory("annindex").toString
    val p = graft.pipeline.AnnIndex.Params(nClusters = 4, m = 4, k = 8, iters = 1)
    graft.pipeline.AnnIndex.build(spark, sf0001, dir, p)
    // artifacts exist; codes are physically partitioned by cell
    val cells = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cluster_id=")).map(_.getName)
    assert(cells.length >= 2, s"expected multiple cell partitions, got ${cells.toSeq}")
    assert(spark.read.parquet(s"$dir/centroids").count() == 4)
    assert(spark.read.parquet(s"$dir/codebook").count() == 4 * 8)
    // degenerate knobs reduce to exact search, served from the index
    val n = Tables.embeddings(spark, sf0001).count().toInt
    val got = graft.pipeline.AnnIndex.search(spark, sf0001, dir,
      nprobe = 4, shortlist = n, topK = 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5("l2").keySet)
    // serving twice is deterministic and touches no training state
    val again = graft.pipeline.AnnIndex.search(spark, sf0001, dir,
      nprobe = 4, shortlist = n, topK = 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("AnnKernels JVM assignment twins match the expression shapes exactly") {
    import graft.queries.AnnKernels
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // ---- cells: expression shape (crossJoin + min(struct(-csim, id)))
    val cent = AnnServing.seedPick(spark, e, 4, "centroid")
      .select(col("pick_id").as("cluster_id"), col("v").as("cv"))
      .withColumn("cnrm",
        sqrt(aggregate(transform(col("cv"), x => x * x), lit(0.0), (a, x) => a + x)))
    val exprCells = e
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .crossJoin(broadcast(cent))
      .withColumn("csim",
        aggregate(zip_with(col("v"), col("cv"), (a, b) => a * b), lit(0.0), (a, x) => a + x)
          / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("csim")), col("cluster_id"))).as("best"))
      .select(col("vec_id"), col("best.cluster_id").as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val jvmCells = AnnKernels.assignCellsJvm(e, AnnKernels.centArray(cent))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(jvmCells == exprCells)
    // ---- codes: expression shape (broadcast join + min(struct(dist, code)))
    val book = AnnServing.pqCodebook(spark, sf0001, m = 4, k = 8, iters = 1)
    val dim = e.select(size(col("v"))).head().getInt(0)
    val exprCodes = AnnServing
      .assignCodes(AnnServing.subvectors(e, 4, dim / 4), book)
      .select("vec_id", "sub", "code").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val jvmCodes = AnnKernels.assignCodesJvm(e, AnnKernels.bookArrays(book))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(jvmCodes == exprCodes)
    // ---- full codebook training with jvmAssign: identical codebook out
    val emb = Tables.embeddings(spark, sf0001)
    val bookExpr = AnnServing.pqCodebookOf(spark, emb, 4, 8, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val bookJvm = AnnServing.pqCodebookOf(spark, emb, 4, 8, iters = 2,
      jvmAssign = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(bookJvm == bookExpr)
  }

  test("pqCodebook has the full m x k shape with no lost codewords") {
    val book = AnnServing.pqCodebook(spark, sf0001, m = 4, k = 8, iters = 2)
      .collect()
    assert(book.length == 4 * 8, s"codebook rows ${book.length}")
    // empty-cluster coalesce must leave every (sub, code) with a vector
    assert(book.forall(r => !r.isNullAt(2) && r.getSeq[Double](2).length == 16))
  }
}
