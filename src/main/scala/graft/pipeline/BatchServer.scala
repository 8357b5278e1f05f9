package graft.pipeline

import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving stage (`pipeline/data_module.py:125-166`): epoch-seeded
  * shuffling, batch grouping with drop_last (R3), inverse-frequency sampler
  * weights (A1/A2/J1) and a deterministic with-replacement weighted draw
  * (R2) via inverse-CDF range join.
  *
  * Scale: the shuffle is an `orderBy(hash)` — a full sort, but of *keys*,
  * and Spark executes it as a range-partitioned sort, no single-node
  * bottleneck. The weighted draw joins draws to a cumulative-weight table
  * (broadcast when groups are few, range-join otherwise).
  */
object BatchServer {

  /** R3: epoch-seeded uniform shuffle + fixed-size batch ids; incomplete
    * trailing batch dropped when dropLast. */
  def shuffledBatches(df: DataFrame, idCol: String, epoch: Long,
                      batchSize: Int, dropLast: Boolean): DataFrame = {
    val w = Window.orderBy(Det.seededKey(s"epoch$epoch", col(idCol)), col(idCol))
    val out = df.withColumn("_rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(_rn - 1) DIV $batchSize"))
      .withColumn("pos_in_batch", expr(s"(_rn - 1) % $batchSize"))
    val sized =
      if (dropLast) {
        val n = df.count()
        out.filter(col("_rn") <= (n / batchSize) * batchSize)
      } else out
    sized.drop("_rn")
  }

  /** A1/A2/J1 (`pipeline/utils.py:88-135` `build_sampler_weights`):
    * inverse-frequency weight per row over a composite key (nulls are
    * groups, matching pandas dropna=False). */
  def inverseFrequencyWeights(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grp = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_grp_n"))
    val tot = df.agg(count(lit(1)).as("_total"))
    df.join(broadcast(grp), keyCols, "left")
      .crossJoin(broadcast(tot))
      .withColumn("weight", col("_total").cast("double") / col("_grp_n").cast("double"))
      .drop("_grp_n", "_total")
  }

  /** R2 WeightedRandomSampler analog: `draws` seeded with-replacement picks
    * ∝ weight. Deterministic inverse-CDF: u_i = hash(i, seed) ∈ [0,1),
    * pick the row whose cumulative-weight interval contains u_i·W.
    * Declared contract checks the weights (Q05); the draw itself is
    * property-tested (SURVEY §7.4.4). */
  def weightedDraw(df: DataFrame, idCol: String, draws: Int, seed: Long): DataFrame = {
    val spark = df.sparkSession
    val w = Window.orderBy(col(idCol))
    val cum = df.withColumn("_cum_hi", sum(col("weight")).over(w))
      .withColumn("_cum_lo", col("_cum_hi") - col("weight"))
    val total = df.agg(sum(col("weight")).as("_w_total"))
    val drawsDf = spark.range(draws.toLong).select(col("id").as("draw_nr"))
      .crossJoin(broadcast(total))
      .withColumn("_u",
        (pmod(xxhash64(col("draw_nr"), lit(seed)), lit(1L << 24)).cast("double")
          / lit((1L << 24).toDouble)) * col("_w_total"))
    // interval containment join: _cum_lo <= u < _cum_hi
    drawsDf.join(cum, col("_u") >= col("_cum_lo") && col("_u") < col("_cum_hi"))
      .drop("_u", "_cum_lo", "_cum_hi", "_w_total")
  }
}
