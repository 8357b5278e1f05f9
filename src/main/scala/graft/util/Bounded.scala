package graft.util

import org.apache.spark.sql.DataFrame

/** The one gate for driver-side materialization of a plan into a literal
  * frame (the "collected literal frames keep every join a broadcast"
  * pattern used by the k-means/codebook trainers). Every such site has a
  * bound that holds BY CONSTRUCTION (a limit(k), a groupBy over ≤nCluster
  * keys, a vocabulary) — this helper makes the bound a runtime assertion
  * too, so a refactor that accidentally routes a corpus-sized frame into
  * a collect fails loudly at the site instead of OOMing the driver or
  * silently serializing gigabytes into a plan literal (SURVEY §4's
  * no-collect-on-the-data-path rule, made unregressable).
  */
object Bounded {

  /** Collect `plan` (must have ≤ `cap` rows) into a literal DataFrame —
    * Catalyst sees a LocalRelation, so every later join against it is a
    * broadcast with no recomputation of the source plan. */
  def literalFrame(plan: DataFrame, cap: Int, what: String): DataFrame = {
    val rows = plan.collect()
    require(rows.length <= cap,
      s"$what collected ${rows.length} rows, over its documented bound of " +
        s"$cap — a literal frame must be broadcast-sized by construction")
    plan.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), plan.schema)
  }

  /** Collect `plan`'s rows for driver-side arithmetic (scan-range
    * derivation, loop bounds) under the same loud cap as
    * [[literalFrame]] — for sites that need the VALUES, not a
    * re-plantable frame. */
  def rows(plan: DataFrame, cap: Int,
           what: String): Array[org.apache.spark.sql.Row] = {
    val rows = plan.collect()
    require(rows.length <= cap,
      s"$what collected ${rows.length} rows, over its documented bound of " +
        s"$cap — driver-side row sets must be bounded by construction")
    rows
  }
}
