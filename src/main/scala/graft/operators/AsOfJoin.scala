package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single most recent right
  * row with the same key whose timestamp is at-or-before (inclusive) or
  * strictly-before the left row's — the temporal join kdb `aj`, pandas
  * `merge_asof`, and DuckDB `ASOF JOIN` provide, which Spark lacks as a
  * built-in.
  *
  * Implementation is the union + per-key running-window technique, chosen
  * over a range join because it is ONE shuffle with bounded state:
  *
  *   1. tag right rows side=0 carrying their payload as a struct, left
  *      rows side=1 with a null payload;
  *   2. `unionByName` (right rows take nulls for left-only columns);
  *   3. one per-key window ordered by (ts, side, tiebreak):
  *      `last(payload, ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT ROW
  *      is the latest right payload seen at-or-before each row;
  *   4. keep side=1, flatten the matched struct under `prefix`.
  *
  * The payload rides in ONE struct so every matched field comes from the
  * SAME right row (per-field `last(ignoreNulls)` would too, but only by
  * the accident of synchronized nulls — the struct makes it structural).
  *
  * Scale shape (100 TB): a single hash shuffle on the key plus a per-key
  * sort — the same cost class as sessionization (EventQueries q24c), never
  * a range-join row explosion and never a global window. Running state per
  * key is one payload struct. Skewed keys take the same salting lever as
  * any hot groupBy ([[Salt]]); a key whose history doesn't fit one task's
  * sort spills, it doesn't break.
  *
  * Semantics knobs:
  *   - `inclusive` (default): a right row at exactly left.ts matches
  *     (side 0 sorts before side 1). `inclusive=false` sorts right rows
  *     AFTER left rows at equal ts, so only strictly-earlier rows match.
  *   - ties among right rows at one (key, ts) resolve to the greatest
  *     `tiebreak` (the last in window order) — deterministic by contract,
  *     `tiebreak` must totally order right rows within a key+ts.
  *   - `tolerance`: maximum allowed `left.ts - right.ts` (same unit as
  *     `ts`); staler matches are nulled out, mirroring pandas
  *     `merge_asof(tolerance=...)`.
  *
  * Reference provenance: the reference has no temporal join (pandas-side
  * `merge` on exact keys only, `pipeline/data_split.py`); this is part of
  * the declared extension surface (SURVEY §2.13).
  */
object AsOfJoin {

  /** @param left     frame to enrich; must contain `keys`, `ts`, `tiebreak`
    * @param right    frame supplying matches; must contain `keys`, `ts`,
    *                 `tiebreak`, and `payload`
    * @param keys     equi-join key columns
    * @param ts       numeric/orderable event-time column name (shared)
    * @param tiebreak total-order column within (key, ts) (shared name)
    * @param payload  right columns to surface on matches (ts/tiebreak are
    *                 always included so callers can compute gaps)
    * @param prefix   prepended to flattened payload column names
    * @param tolerance max left.ts − right.ts; staler matches become null
    * @param inclusive whether right.ts == left.ts may match
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      tiebreak: String,
      payload: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Column] = None,
      inclusive: Boolean = true): DataFrame = {
    val payCols = (payload ++ Seq(ts, tiebreak)).distinct
    val rightSide = if (inclusive) 0 else 2
    val tagged = right.select(
      (keys :+ ts :+ tiebreak).distinct.map(col) ++ Seq(
        struct(payCols.map(col): _*).as("_asof_payload"),
        lit(rightSide).as("_asof_side")): _*)
    val leftTagged = left
      .withColumn("_asof_payload",
        lit(null).cast(tagged.schema("_asof_payload").dataType))
      .withColumn("_asof_side", lit(1))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_asof_side").asc, col(tiebreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged
      .unionByName(tagged, allowMissingColumns = true)
      .withColumn("_asof_m", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        matched.withColumn("_asof_m",
          when(col(ts) - col("_asof_m")(ts) <= tol, col("_asof_m")))
      case None => matched
    }
    payCols
      .foldLeft(bounded) { (df, f) =>
        df.withColumn(prefix + f, col("_asof_m")(f))
      }
      .drop("_asof_m", "_asof_payload", "_asof_side")
  }
}
