package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every declared query.
  *
  * Mirrors the reference's seeded-randomness discipline (qcardia-data seeds
  * every shuffle/sample, e.g. `/root/reference/src/qcardia_data/pipeline/
  * data_split.py:73-84`) but replaces RNG state with a pure key hash so the
  * result is partition- and retry-invariant on a cluster: Spark's `rand(seed)`
  * is row-order dependent and must never appear in a declared query
  * (SURVEY §7.4.2).
  */
object Det {

  /** Seeded pseudo-random sort key: `md5(k1:k2:...:seed)`.
    * Exactly reproducible in DuckDB as
    * `md5(concat_ws(':', CAST(k AS VARCHAR), 'seed'))` — both engines emit
    * lowercase hex, and string order is plain byte order in both.
    */
  def seededKey(seed: String, cols: Column*): Column =
    md5(concat_ws(":", cols.map(_.cast("string")) :+ lit(seed): _*))

  /** Exact money arithmetic: a 2-decimal double → integer cents (long).
    * `x*100` is within 1e-9 of an integer for 2-decimal inputs, so
    * round-then-cast is exact and identical in DuckDB
    * (`CAST(ROUND(x*100) AS BIGINT)`). Integer sums are associative —
    * immune to partition/order effects that make big double sums drift.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** cents → dollars as double; single IEEE division, engine-identical. */
  def unCents(c: Column): Column = c.cast("double") / lit(100.0)

  /** DuckDB-side spellings, kept next to their Spark twins. */
  object sql {
    def seededKey(seed: String, keys: String*): String =
      s"md5(concat_ws(':', ${keys.map(k => s"CAST($k AS VARCHAR)").mkString(", ")}, '$seed'))"
    def cents(x: String): String = s"CAST(ROUND(($x)*100) AS BIGINT)"
    /** exact cent sum → dollars; SUM(BIGINT) is HUGEINT in DuckDB, cast back. */
    def sumMoney(x: String): String =
      s"CAST(SUM(${cents(x)}) AS DOUBLE)/1e2"
  }
}
