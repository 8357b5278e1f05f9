package graft.tools

import graft.Tables
import graft.pipeline.AnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN-index flatness one scale up — BASELINE.md's evidence that the
  * persistent IVF-PQ index keeps its build/serve/append costs sane at an
  * sf100-shaped corpus (~5M vectors; `DataGen 250 <dir> embeddings`):
  *
  *   - build once (timed) on the base corpus (all but the last
  *     `appendFrac` of vec_ids);
  *   - serve three times (min = steady state — the number expected to be
  *     near-FLAT vs sf10, because probes read only nprobe/nClusters of
  *     the cell-partitioned codes and rerank a fixed-size shortlist);
  *   - append the increment WITHOUT retraining (timed; AnnIndex.append
  *     codes it with the already-trained quantizers and appends to the
  *     cell partitions);
  *   - serve again over the grown corpus and audit recall@5 against the
  *     exact brute-force L2 top-5 both before and after the append, so
  *     "recall unchanged" is measured, not asserted.
  *
  * Usage: runMain graft.tools.AnnScaleBench <embDir> [appendFrac] [nClusters] [indexDir] [nprobe] [shortlist] [serveonly]
  * `serveonly` reuses an existing indexDir (post-append state) and only
  * measures serve+recall at the given knobs — the knob-sweep mode for
  * the recall-vs-cost curve at this corpus size.
  */
object AnnScaleBench {
  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("bench_scratch/emb5m")
    val appendFrac = args.lift(1).map(_.toDouble).getOrElse(0.01)
    // 0 = self-sized ≈√n (the default posture); a fixed count remains a
    // knob for sizing-rule comparisons
    val nClusters = args.lift(2).map(_.toInt).getOrElse(0)
    val indexDir = args.lift(3).getOrElse(
      java.nio.file.Files.createTempDirectory("annscale").toString)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(8)
    val shortlist = args.lift(5).map(_.toInt).getOrElse(500)
    val serveOnly = args.contains("serveonly")
    val spark = graft.Session.local(appName = "graft-ann-scale-bench")
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Tables.embeddings(spark, embDir)
    val nAll = emb.count()
    val nBase = nAll - math.max(1L, (nAll * appendFrac).toLong)
    val base = emb.filter(col("vec_id") < nBase)
    val increment = emb.filter(col("vec_id") >= nBase)

    // exact brute-force L2 top-5 for the 5 probes — the recall reference
    def exactTop5(corpus: DataFrame): Map[Long, Set[Long]] = {
      val e = corpus.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val pr = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      e.crossJoin(broadcast(pr))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("d",
          aggregate(zip_with(col("v"), col("pv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (a, x) => a + x))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("d").asc, col("vec_id"))))
        .filter(col("rk") <= 5)
        .select("probe_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    }
    def recallOf(served: DataFrame, exact: Map[Long, Set[Long]]): Double = {
      val got = served.select("probe_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val hits = exact.toSeq.map { case (k, ex) =>
        got.getOrElse(k, Set.empty).intersect(ex).size.toDouble / ex.size }
      hits.sum / hits.size
    }
    if (serveOnly) {
      // knob-sweep mode: reuse the existing (post-append) index, measure
      // serve cost + recall at the given (nprobe, shortlist) only
      val serves = (1 to 3).map(_ =>
        timed(AnnIndex.searchOf(spark, emb, indexDir, nprobe, shortlist).count())._2)
      val recall = recallOf(
        AnnIndex.searchOf(spark, emb, indexDir, nprobe, shortlist), exactTop5(emb))
      println(f"""{"metric":"ann_scale_serve","n":$nAll%d,"nprobe":$nprobe%d,"shortlist":$shortlist%d,"serve_secs":[${serves.map(x => f"$x%.2f").mkString(",")}],"serve_min_sec":${serves.min}%.2f,"recall5":$recall%.3f,"emb":"$embDir"}""")
      spark.stop()
      return
    }

    val p = AnnIndex.Params(nClusters = nClusters)
    val (_, buildS) = timed(AnnIndex.buildOf(spark, base, indexDir, p))
    // report the RESOLVED cell count (nClusters=0 self-sizes inside build)
    val cells = spark.read.parquet(s"$indexDir/centroids").count()
    // serve three times: first pays file-index warmup, min is steady state
    val serves = (1 to 3).map(_ =>
      timed(AnnIndex.searchOf(spark, base, indexDir, nprobe, shortlist).count())._2)

    val exactBase = exactTop5(base)
    val recallBase = recallOf(
      AnnIndex.searchOf(spark, base, indexDir, nprobe, shortlist), exactBase)

    val (_, appendS) = timed(AnnIndex.append(spark, increment, indexDir))
    val servesAfter = (1 to 3).map(_ =>
      timed(AnnIndex.searchOf(spark, emb, indexDir, nprobe, shortlist).count())._2)
    val exactFull = exactTop5(emb)
    val recallAfter = recallOf(
      AnnIndex.searchOf(spark, emb, indexDir, nprobe, shortlist), exactFull)

    println(f"""{"metric":"ann_scale","n_base":$nBase%d,"n_append":${nAll - nBase}%d,"n_clusters":$cells%d,"build_sec":$buildS%.2f,"serve_secs":[${serves.map(x => f"$x%.2f").mkString(",")}],"serve_min_sec":${serves.min}%.2f,"append_sec":$appendS%.2f,"serve_after_secs":[${servesAfter.map(x => f"$x%.2f").mkString(",")}],"serve_after_min_sec":${servesAfter.min}%.2f,"recall5_base":$recallBase%.3f,"recall5_after":$recallAfter%.3f,"emb":"$embDir"}""")
    spark.stop()
  }
}
