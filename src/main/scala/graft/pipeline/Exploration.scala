package graft.pipeline

import graft.tensor.Kernels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The exploration stage (`setup/exploration.py:11-106`): dataset-wide
  * descriptive statistics — per-record intensity/geometry features, then a
  * mean/median/std + 9-point quantile sweep per dataset (A5/A6; numpy std
  * is population std, quantiles `method="nearest"`).
  *
  * Scale shape: one kernel pass per record computes the features, a single
  * groupBy computes the sweep — no collect, no per-record driver loop (the
  * reference iterates subjects in Python, `exploration.py:42-44`).
  */
object Exploration {

  private val quantiles = Seq(0.0, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0)

  /** per-record features from a tensor column: intensity stats + voxel
    * counts (the exploration CSV's columns). */
  def recordFeatures(records: DataFrame, tensorCol: String): DataFrame = {
    val st = Kernels.bufferStats(col(s"$tensorCol.data"))
    records
      .withColumn("rec_min", st("_1")).withColumn("rec_max", st("_2"))
      .withColumn("rec_mean", st("_3")).withColumn("rec_std", st("_4"))
      .withColumn("rec_numel", st("_5"))
  }

  /** dataset-level sweep over one feature column: mean, population std,
    * exact nearest-rank quantiles (floor(q·(n−1)+0.5)+1, the same pin as
    * declared query Q11). */
  def sweep(features: DataFrame, groupCol: String, featureCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    val ranked = features
      .withColumn("_rn", row_number().over(w.orderBy(col(featureCol))))
      .withColumn("_n", count(lit(1)).over(w))
    val qCols = quantiles.map { q =>
      val nm = "q" + (q * 100).round.toString.reverse.padTo(2, '0').reverse
      max(when(col("_rn") === (floor(lit(q) * (col("_n") - 1).cast("double") + 0.5) + 1),
        col(featureCol))).as(nm)
    }
    val aggs =
      count(lit(1)).as("n") +:
        avg(col(featureCol)).as("mean") +:
        stddev_pop(col(featureCol)).as("std_pop") +:
        qCols
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*).orderBy(groupCol)
  }

  /** the full exploration report: features → sweeps for each requested
    * feature, returned keyed by feature name. */
  def explore(records: DataFrame, tensorCol: String, groupCol: String,
              features: Seq[String] = Seq("rec_mean", "rec_max", "rec_std")): Map[String, DataFrame] = {
    val f = recordFeatures(records, tensorCol)
    features.map(ft => ft -> sweep(f, groupCol, ft)).toMap
  }
}
