package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for ADDITIVE grouped aggregates — the
  * natural consumer of [[Snapshots.diff]]'s change feed: a 100 TB fact
  * table's downstream count/sum rollups refresh by reading the CHURN
  * between two snapshot versions, not the table. Inserts contribute
  * +1/+x, deletes −1/−x (an update is its delete+insert pair, which is
  * exactly what the manifest diff emits), so the maintained state is
  * algebraically identical to a full recompute at the new version —
  * IvmSpec pins that equality end-to-end through a snapshot table.
  *
  * Additive means count and sum (and anything derived from them
  * downstream: mean, rates). Non-additive aggregates (min/max/distinct)
  * need retraction-aware state (e.g. the q23 KMV state for distinct) and
  * are out of scope here by design — the require on `sums` column types
  * keeps doubles out, because a float sum maintained by churn drifts
  * from a recompute under reordering; keep money in cents (Det.cents)
  * and the equality is exact.
  *
  * Plan shape: one group-by over the (churn-sized) change frame + one
  * keys-join against the state — both shuffles are delta-sized except
  * the state side, and the state is itself rollup-sized, not
  * fact-table-sized.
  */
object Ivm {

  /** Apply a change frame (`_op` ∈ insert/delete ++ data columns — the
    * [[Snapshots.diff]] schema) to a grouped aggregate state of shape
    * `keys ++ (n, sum_<c>*)`. Groups whose count reaches 0 drop out, so
    * maintained state never accumulates dead keys. */
  def applyDelta(state: DataFrame, changes: DataFrame, keys: Seq[String],
                 sums: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "grouped state needs at least one key")
    sums.foreach { c =>
      val dt = changes.schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte", "decimal").exists(dt.startsWith),
        s"sum column $c is $dt — maintain exact integer/decimal sums only " +
          "(floats drift from a recompute under churn reordering; use cents)")
    }
    val sign = when(col("_op") === "insert", lit(1L))
      .when(col("_op") === "delete", lit(-1L))
    val delta = changes
      .select((col("_op") +: keys.map(col)) ++ sums.map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("_dn"),
        sums.map(c => sum(sign * col(c)).as(s"_d_$c")): _*)
    state.join(delta, keys, "full_outer")
      .select(keys.map(col) ++
        Seq((coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n")) ++
        sums.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
          coalesce(col(s"_d_$c"), lit(0L))).as(s"sum_$c")): _*)
      .filter(col("n") > 0)
  }

  /** Full recompute of the same state shape — the bootstrap at version 1
    * and the parity oracle for the incremental path. */
  def recompute(rows: DataFrame, keys: Seq[String],
                sums: Seq[String] = Nil): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(col(c)).cast("long").as(s"sum_$c")): _*)

  /** Roll a maintained view of snapshot `table` forward from `v0` to
    * `v1` by reading only the churned files. */
  def refresh(state: DataFrame, table: String, v0: Long, v1: Long,
              keys: Seq[String], sums: Seq[String] = Nil): DataFrame = {
    val spark = state.sparkSession
    applyDelta(state, Snapshots.diff(spark, table, v0, v1), keys, sums)
  }
}
