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

  /** First 15 hex chars of an md5 hex string as a 60-bit non-negative
    * long — the shared uniform integer hash behind the KMV sketch (q23)
    * and deterministic Bernoulli sampling (q78). Spark spells it `conv`;
    * the DuckDB twin ([[sql.hex60]]) is positional digit arithmetic —
    * same value, different spelling, both exact (60 bits < 2^63). */
  def hex60(md5Hex: Column): Column =
    conv(substring(md5Hex, 1, 15), 16, 10).cast("long")

  /** [[hex60]] scaled to a uniform double in [0,1): single IEEE division
    * by 2^60 (exactly representable), engine-identical. */
  def unit60(md5Hex: Column): Column =
    hex60(md5Hex).cast("double") / lit((1L << 60).toDouble)

  /** DuckDB-side spellings, kept next to their Spark twins. */
  object sql {
    def seededKey(seed: String, keys: String*): String =
      s"md5(concat_ws(':', ${keys.map(k => s"CAST($k AS VARCHAR)").mkString(", ")}, '$seed'))"
    /** hex → 60-bit BIGINT by positional arithmetic (DuckDB has no base
      * conversion; 15 nibbles keep every term and the sum within int64). */
    def hex60(h: String): String =
      (0 until 15).map { i =>
        val w = 1L << (4 * (14 - i)) // 16^(14-i)
        s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * $w"
      }.mkString("(", " + ", ")")
    def unit60(h: String): String =
      s"(CAST(${hex60(h)} AS DOUBLE) / 1152921504606846976)"
    def cents(x: String): String = s"CAST(ROUND(($x)*100) AS BIGINT)"
    /** exact cent sum → dollars; SUM(BIGINT) is HUGEINT in DuckDB, cast back. */
    def sumMoney(x: String): String =
      s"CAST(SUM(${cents(x)}) AS DOUBLE)/1e2"
  }
}
