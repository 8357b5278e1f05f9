package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (the "salting for skew" lever in the scale checklist):
  * two-phase aggregation and replicated-build joins for hot keys.
  *
  * AQE's skew-join splitting handles sort-merge inputs automatically; these
  * operators cover what AQE can't: a skewed *aggregation* key (one giant
  * group saturates a single reducer) and a skewed *broadcast-ineligible*
  * join build.
  */
object Salt {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial-aggregates
    * the hot key across `buckets` reducers, then a second cheap aggregation
    * merges the buckets. `merge` must be an algebraic combiner of the
    * partials (sum/min/max/count-style). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Replicated ("salted broadcast-free") join for a skewed fact⋈dim where
    * the dim is too large to broadcast whole but each key's dim rows are
    * small: explode the dim `buckets`× with a salt column, salt the fact
    * rows by hash of a row-unique expression, join on (key, salt). Spreads
    * each hot fact key over `buckets` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
                 factRowId: Column): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(factRowId), lit(buckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
