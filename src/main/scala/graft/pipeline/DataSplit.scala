package graft.pipeline

import graft.operators.Ranks
import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The split stage (`pipeline/data_split.py:13-86`) as a reusable DataFrame
  * operator: seeded grouped test selection (A3, `setup/test_splits.py`),
  * optional overlap removal by predicate (J4/J5), anti-join dev set (J3),
  * seeded train/valid partition with round(n·p) sizing (R1).
  *
  * All randomness is `md5(id:seed)` ordering — partition/retry-invariant
  * (SURVEY §7.4.2). The dev-set rank is a two-phase `Ranks.globalRowNumber`
  * (per-bucket rank + broadcast offsets) — no single-reducer global window.
  */
object DataSplit {

  /** @param subjects one row per subject
    * @param idCol    unique subject id column name
    * @param groupCol grouping column for the per-group test draw
    * @param overlap  predicate marking subjects to drop from BOTH dev and
    *                 test after selection (data_split.py:63-67 semantics)
    * @return subjects with a `split` column ∈ {test, valid, train}
    */
  def split(subjects: DataFrame, idCol: String, groupCol: String,
            testPerGroup: Int, validFraction: Double, seed: Long,
            overlap: Option[Column] = None): DataFrame = {
    val id = col(idCol)
    val wTest = Window.partitionBy(col(groupCol))
      .orderBy(Det.seededKey(seed.toString, id), id)
    val ranked = subjects.withColumn("_rk_test", row_number().over(wTest))
    val kept = overlap.map(p => ranked.filter(!p)).getOrElse(ranked)
    val test = kept.filter(col("_rk_test") <= testPerGroup)
      .drop("_rk_test").withColumn("split", lit("test"))
    val dev = kept.filter(col("_rk_test") > testPerGroup).drop("_rk_test")
    val devKey = Det.seededKey((seed + 4444).toString, id)
    val nDev = dev.agg(count(lit(1)).as("_n_dev"))
    val trainValid = Ranks.globalRowNumber(dev, Ranks.hexBucket(devKey),
        Seq(devKey, id), "_rn")
      .crossJoin(broadcast(nDev))
      .withColumn("split",
        when(col("_rn") <= floor(col("_n_dev").cast("double") * validFraction + 0.5), "valid")
          .otherwise("train"))
      .drop("_rn", "_n_dev")
    test.unionByName(trainValid)
  }

  /** U1/A13 summary: files/subjects per split (`pipeline/utils.py:74-83`). */
  def summary(split: DataFrame, idCol: String): DataFrame =
    split.groupBy("split")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col(idCol)).as("n_subjects"))
      .orderBy("split")
}
