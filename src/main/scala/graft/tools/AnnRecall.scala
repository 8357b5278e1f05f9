package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Recall audit for the ANN family: recall@5 of each approximate path
  * against the EXACT brute-force top-5 under that path's own metric —
  * cosine for the IVF queries (q36, q43; ground truth = q25), L2 for the
  * PQ asymmetric-distance search (q56 ranks by squared L2; scoring it
  * against cosine ground truth would conflate metric choice with
  * quantization loss on these unnormalized vectors). The accuracy number
  * that justifies the approximate paths' speed is thereby measured, not
  * asserted (BASELINE.md records the per-scale values).
  *
  * All queries emit (probe_id, rk, neighbor_id, ...) for the same 5
  * declared probes; results are ≤25 rows each, so the driver-side compare
  * is bounded. The exact-L2 reference is one corpus scan against the
  * 5-probe broadcast.
  *
  * Usage: runMain graft.tools.AnnRecall <sfDir>
  * Prints one JSON line per ANN query.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local(appName = "graft-ann-recall")
    spark.sparkContext.setLogLevel("WARN")
    def topk(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .select("probe_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    // exact reference top-K under both metrics: strict @5 plus a relaxed
    // "picks land in the exact top 1% of the corpus" number that stays
    // comparable across scales; one corpus scan against the 5-probe
    // broadcast each
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val relaxedK = math.max(50, (e.count() / 100L).toInt)
    def exactTop(metricCol: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                 asc: Boolean, k: Int): Map[Long, Set[Long]] = {
      val pr = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      val scored = metricCol(e.crossJoin(broadcast(pr))
        .filter(col("vec_id") =!= col("probe_id")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
        .orderBy(if (asc) col("score").asc else col("score").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select("probe_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    }
    def l2(df: org.apache.spark.sql.DataFrame) = df.withColumn("score",
      aggregate(zip_with(col("v"), col("pv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
    def cos(df: org.apache.spark.sql.DataFrame) = df.withColumn("score",
      aggregate(zip_with(col("v"), col("pv"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
        / (sqrt(aggregate(transform(col("v"), a => a * a), lit(0.0), (acc, x) => acc + x))
          * sqrt(aggregate(transform(col("pv"), a => a * a), lit(0.0), (acc, x) => acc + x))))
    val refs = Map(
      "q36_ivf_ann" -> ("cosine", exactTop(cos, asc = false, 5), exactTop(cos, asc = false, relaxedK)),
      "q43_ivf_kmeans" -> ("cosine", exactTop(cos, asc = false, 5), exactTop(cos, asc = false, relaxedK)),
      "q56_pq_adc_search" -> ("l2", exactTop(l2, asc = true, 5), exactTop(l2, asc = true, relaxedK)))
    Seq("q36_ivf_ann", "q43_ivf_kmeans", "q56_pq_adc_search").foreach { name =>
      val (metric, exact5, exactK) = refs(name)
      val got = topk(name)
      def mean(ref: Map[Long, Set[Long]]): Double = {
        val rs = exact5.keys.toSeq.map { p =>
          got.getOrElse(p, Set.empty[Long]).intersect(ref(p)).size.toDouble /
            got.getOrElse(p, Set.empty[Long]).size.max(1)
        }
        rs.sum / rs.size
      }
      val strict = {
        val rs = exact5.map { case (p, ex) =>
          got.getOrElse(p, Set.empty[Long]).intersect(ex).size.toDouble / ex.size }
        rs.sum / rs.size
      }
      println(f"""{"metric":"ann_recall","query":"$name","k":5,"vs":"$metric%s","recall":$strict%.3f,"in_top_pct":${mean(exactK)}%.3f,"relaxed_k":$relaxedK%d,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
