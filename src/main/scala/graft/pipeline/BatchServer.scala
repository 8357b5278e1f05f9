package graft.pipeline

import graft.operators.Ranks
import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving stage (`pipeline/data_module.py:125-166`): epoch-seeded
  * shuffling, batch grouping with drop_last (R3), inverse-frequency sampler
  * weights (A1/A2/J1) and a deterministic with-replacement weighted draw
  * (R2) via inverse-CDF range join.
  *
  * Scale: the epoch shuffle is a two-phase rank over the seeded key
  * (`Ranks.globalRowNumber` — per-bucket windows, no single-reducer sort).
  * The weighted draw joins draws to a cumulative-weight table (broadcast
  * when groups are few, range-join otherwise).
  */
object BatchServer {

  /** R3: epoch-seeded uniform shuffle + fixed-size batch ids; incomplete
    * trailing batch dropped when dropLast. The rank is the two-phase
    * `Ranks.globalRowNumber` (this is the serving hot path — a bare
    * `Window.orderBy` would single-reduce every epoch), and the dropLast
    * row count falls out of the same bucket-count pass, so no extra
    * `df.count()` action. */
  def shuffledBatches(df: DataFrame, idCol: String, epoch: Long,
                      batchSize: Int, dropLast: Boolean): DataFrame = {
    val key = Det.seededKey(s"epoch$epoch", col(idCol))
    val (ranked, n) = Ranks.globalRowNumberWithCount(
      df, Ranks.hexBucket(key), Seq(key, col(idCol)), "_rn")
    val out = ranked
      .withColumn("batch_id", expr(s"(_rn - 1) DIV $batchSize"))
      .withColumn("pos_in_batch", expr(s"(_rn - 1) % $batchSize"))
    val sized =
      if (dropLast) out.filter(col("_rn") <= (n / batchSize) * batchSize)
      else out
    sized.drop("_rn")
  }

  /** A1/A2/J1 (`pipeline/utils.py:88-135` `build_sampler_weights`):
    * inverse-frequency weight per row over a composite key (nulls are
    * groups, matching pandas dropna=False). */
  def inverseFrequencyWeights(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grp = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_grp_n"))
    val tot = df.agg(count(lit(1)).as("_total"))
    // NULL-SAFE (<=>) merge-back: the declared contract treats NULL group
    // keys as ordinary groups (reference utils.py:121-135 — dropna=False
    // groupby + null-matching merge keys; SURVEY §2.3 J1/§2.4 A1). A
    // using-columns join uses plain equality, so a NULL-keyed row would
    // never match its own group row and weight would come back NULL.
    // EqualNullSafe is still an equi-join key to Spark's planner, so the
    // broadcast hash join is unchanged.
    val g = grp.select(keyCols.map(c => col(c).as(s"_g_$c")) :+ col("_grp_n"): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"_g_$c")).reduce(_ && _)
    df.join(broadcast(g), cond, "left")
      .crossJoin(broadcast(tot))
      .withColumn("weight", col("_total").cast("double") / col("_grp_n").cast("double"))
      .drop(keyCols.map("_g_" + _) ++ Seq("_grp_n", "_total"): _*)
  }

  /** 60-bit deterministic total-order key over an id column — md5-based
    * ([[Det.hex60]]) rather than xxhash64 so the cumulative order (and
    * therefore every interval a draw lands in) is REPLAYABLE IN SQL:
    * `hex60(md5(CAST(id AS VARCHAR)))` — the change that let q141
    * oracle-hash the full weighted draw (VERDICT r12 item 3). */
  private[pipeline] def ordKey(c: Column): Column = Det.hex60(md5(c.cast("string")))

  /** Scalable deterministic prefix sum over a hashed-id total order:
    * two-phase — per-bucket partial sums (tiny) get running offsets, rows
    * window-sum only within their bucket. A single global
    * `Window.orderBy(id)` funnels every row through one reducer; this
    * shape never does, and the result is identical because the bucket
    * function preserves the key order. Adds only `_cum_hi` to the
    * caller's schema. */
  def scalableCumSum(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    cumSumWithBucket(df, idCol, valueCol).drop("_b")

  /** [[scalableCumSum]] with the internal bucket column riding along as
    * `_b` — PRIVATE: [[weightedDraw]] routes draws by the same bucket,
    * and recomputing it there would pay a second md5 pass over the
    * corpus for a value this pass just derived (r13 reviews: the public
    * variant keeps its schema contract — callers must not inherit an
    * undocumented column, nor have an existing `_b` overwritten). */
  private def cumSumWithBucket(df: DataFrame, idCol: String,
                               valueCol: String): DataFrame = {
    val withB = df.withColumn("_ord", ordKey(col(idCol)))
      .withColumn("_b", shiftright(col("_ord"), 50))
    val bucketTotals = withB.groupBy("_b").agg(sum(col(valueCol)).as("_b_sum"))
    // offsets frame is ≤1024 post-agg rows — deliberate (non-foldable)
    // single-partition key keeps the tiny running sum off the
    // "no partition defined" path
    val offsets = bucketTotals.withColumn("_b_off",
      coalesce(sum(col("_b_sum")).over(
        Window.partitionBy(Ranks.onePartition(col("_b"))).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("_b"), col("_b_off"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_ord"), col(idCol))
    withB.join(broadcast(offsets), Seq("_b"))
      .withColumn("_cum_hi", col("_b_off") + sum(col(valueCol)).over(wIn))
      .drop("_b_off", "_ord")
  }

  /** R2 WeightedRandomSampler analog: `draws` seeded with-replacement picks
    * ∝ weight. Deterministic inverse-CDF: u_i = hex60(md5(i:draw:seed))
    * mod W — pure 64-bit integer arithmetic, pick the row whose
    * cumulative-weight interval contains u_i. (Modulo bias is ≤ W/2^60
    * relative — ~10⁻⁵ at W≈10¹³ — irrelevant next to the sampler's own
    * variance, and determinism, not entropy, is the contract here.)
    *
    * Weights are quantized to exact integer micro-units (×1e6) first:
    * integer cumulative sums are associative, so adjacent intervals tile
    * [0, W) exactly — no IEEE ulp gaps/overlaps at boundaries, every draw
    * matches exactly one row, and the result is strictly
    * partition-invariant. `_w_total` is `max(_cum_hi)` of the same sums,
    * never a separately-ordered double sum. (Weights below 5e-7 quantize
    * to zero and are never drawn.)
    * Declared contract: q05 checks the weights and q141 oracle-hashes the
    * FULL draw (VERDICT r12 item 3 closed the old property-test-only
    * posture): every hash here is md5-based and every sum integer, so
    * DuckDB replays draw-by-draw byte-for-byte. */
  def weightedDraw(df: DataFrame, idCol: String, draws: Int, seed: Long): DataFrame = {
    val spark = df.sparkSession
    val units = df.withColumn("_wu", round(col("weight") * 1e6, 0).cast("long"))
    // `_b` rides out of cumSumWithBucket (same bucket function, computed
    // once): each bucket owns a contiguous cumulative range, so a draw
    // can be ROUTED to its bucket through the tiny boundary table and
    // then equi-join on _b — a range-predicate join straight against
    // `cum` would be a nested-loop over the corpus-sized table
    val cum = cumSumWithBucket(units, idCol, "_wu")
      .withColumn("_cum_lo", col("_cum_hi") - col("_wu"))
    val bounds = cum.groupBy("_b")
      .agg(min(col("_cum_lo")).as("_b_lo"), max(col("_cum_hi")).as("_b_hi"))
    val total = cum.agg(max(col("_cum_hi")).as("_w_total"))
    val drawsDf = spark.range(draws.toLong).select(col("id").as("draw_nr"))
      .crossJoin(broadcast(total))
      .withColumn("_u", pmod(
        Det.hex60(Det.seededKey(s"draw:$seed", col("draw_nr"))),
        col("_w_total")))
    val routed = drawsDf.join(broadcast(bounds),
      col("_u") >= col("_b_lo") && col("_u") < col("_b_hi"))
    // interval containment, now bucket-local: _cum_lo <= u < _cum_hi
    // (integer, exact); the equi-key _b carries the join
    routed.join(cum, Seq("_b"))
      .filter(col("_u") >= col("_cum_lo") && col("_u") < col("_cum_hi"))
      .drop("_u", "_b", "_b_lo", "_b_hi", "_cum_lo", "_cum_hi", "_w_total", "_wu")
  }
}
