package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranks.
  *
  * A bare `Window.orderBy(...)` (no partition) funnels the whole table
  * through ONE reducer — fine at sf0.1, fatal at 100 TB ("No Partition
  * Defined for Window" in the executor log). These helpers compute the
  * identical rank two-phase:
  *
  *   1. bucket every row by a deterministic MONOTONE coarsening of the
  *      leading order key (so bucket(a) < bucket(b) ⇒ a precedes b),
  *   2. count rows per bucket (tiny aggregate, ≤ a few hundred rows),
  *      fetch the counts and turn them into running offsets baked into the
  *      plan as a map literal — the same bounded-driver-fetch class as
  *      `DatasetCacher.fingerprint`,
  *   3. per-bucket `row_number` (partitioned window — every executor ranks
  *      only its bucket) plus the bucket's offset.
  *
  * The result is bit-identical to the single-reducer form for any TOTAL
  * order (the repo's determinism discipline already requires total orders),
  * because bucket boundaries only decide WHERE the partial ranks are
  * stitched, never the stitched values.
  *
  * Reference provenance: the reference ranks in pandas on one node
  * (`pipeline/data_split.py:73-84`, `setup/reformat/utils.py:218-241`);
  * this is the cluster-shaped equivalent.
  */
object Ranks {

  /** Deliberate single-partition window key for provably TINY frames
    * (post-aggregate bucket tables, post-limit top-k): always 0, but NOT
    * foldable — `Window.partitionBy(lit(0))` gets constant-folded out of
    * the partition spec and degrades back to the global-window shape this
    * file exists to avoid. Use only where the input is bounded by
    * construction. */
  def onePartition(c: Column): Column = pmod(c, lit(1))

  /** 256-way monotone bucket for an md5-hex sort key (`Det.seededKey`):
    * the first two hex chars. String order = byte order, so the prefix is
    * a monotone coarsening, and cardinality is fixed at ≤256 regardless of
    * data size. */
  def hexBucket(key: Column): Column = substring(key, 1, 2)

  /** Global `row_number() OVER (ORDER BY order...)` without a global
    * window.
    *
    * @param bucket deterministic monotone coarsening of `order.head` with
    *               BOUNDED cardinality (≤ ~10⁴ distinct values): e.g.
    *               [[hexBucket]] of an md5 key, a bounded leading key
    *               itself, or `value DIV width` for a bounded numeric
    *               domain. Must never be null.
    * @param order  a TOTAL order (append a unique tiebreak column).
    * @param out    name of the produced 1-based rank column (LongType).
    */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
                      out: String): DataFrame =
    globalRowNumberWithCount(df, bucket, order, out)._1

  /** [[globalRowNumber]] plus the total row count — free, it is the last
    * running offset; saves callers a separate `df.count()` action. */
  def globalRowNumberWithCount(df: DataFrame, bucket: Column,
                               order: Seq[Column], out: String): (DataFrame, Long) = {
    // r19 persist (guide §5): this recipe inherently consumes its input
    // twice — the bucket-count collect below and the ranked output — and
    // the collect is a blocking driver action, so it fills the cache
    // serially and the returned frame reads it (no fill race). Without
    // it every caller recomputed its input chain per consumption (q118
    // ran its events agg ~5×: 3 calls + the final action). Bench/Verify
    // unpersist between queries; MEMORY_AND_DISK spills at scale.
    val withB = df.withColumn("_gb", bucket).persist()
    val counts = withB.groupBy("_gb").agg(count(lit(1)).as("_n"))
      .orderBy("_gb").collect()
    var acc = 0L
    val entries: Array[Column] = counts.flatMap { r =>
      val off = acc; acc += r.getLong(1)
      Seq(lit(r.get(0)), lit(off))
    }
    val offset =
      if (entries.isEmpty) lit(0L)
      else element_at(map(entries.toSeq: _*), col("_gb"))
    val ranked = withB
      .withColumn(out, offset +
        row_number().over(Window.partitionBy(col("_gb")).orderBy(order: _*)))
      .drop("_gb")
    (ranked, acc)
  }

  /** Global `dense_rank() OVER (ORDER BY key [DESC])` for a key whose
    * DISTINCT domain is bounded (e.g. DICOM slice projections — slices per
    * series, not rows): fetch the distinct values (one tiny job), assign
    * dense ranks on the driver, bake a value→rank map literal. No window
    * at all. For unbounded domains rank the distinct frame with
    * [[globalRowNumber]] and join instead. */
  /** Hard cap on the driver-baked distinct-key map. Beyond this the map
    * literal itself becomes the scale hazard this file exists to prevent. */
  val DenseRankMaxKeys = 10000

  def globalDenseRank(df: DataFrame, key: Column, descending: Boolean,
                      out: String): DataFrame = {
    val distinctKeys = df.select(key.as("_dk")).distinct()
      .orderBy(if (descending) col("_dk").desc else col("_dk").asc)
      .limit(DenseRankMaxKeys + 1) // orderBy+limit = distributed TakeOrdered
      .collect().map(_.get(0))
    require(distinctKeys.length <= DenseRankMaxKeys,
      s"globalDenseRank: key has > $DenseRankMaxKeys distinct values — the " +
        "bounded-domain contract is violated and the driver-baked map " +
        "literal would not scale. Rank the distinct frame with " +
        "globalRowNumber and join it back instead.")
    val entries: Array[Column] = distinctKeys.zipWithIndex.flatMap {
      case (v, i) => Seq(lit(v), lit(i.toLong + 1L))
    }
    if (entries.isEmpty) df.withColumn(out, lit(1L))
    else df.withColumn(out, element_at(map(entries.toSeq: _*), key))
  }
}
