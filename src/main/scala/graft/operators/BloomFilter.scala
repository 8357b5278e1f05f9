package graft.operators

import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970, "Space/Time Trade-offs in Hash Coding with
  * Allowable Errors") as a DataFrame-shaped membership pre-filter — the
  * third mergeable sketch next to [[KmvSketch]] (distinct) and
  * [[CountMinSketch]] (frequency): d deterministic hash positions per key
  * over an m-bit space, membership = all d positions set, no false
  * negatives, false positives at rate ≈ (1−e^(−dn/m))^d.
  *
  * Determinism: position j of key x is `hex60(md5(x || '@j')) % m` — the
  * same engine-replayable integer arithmetic as [[CountMinSketch]], so
  * the set-bit SET (and therefore every membership verdict) is a pure
  * function of the key set, independent of partitioning and engine.
  *
  * Representation: the filter is the DISTINCT set-position frame (`pos`),
  * ≤ m rows — not a packed bitset. That keeps it a relational object:
  * mergeable by `union.distinct`, probe-able by join (Catalyst broadcasts
  * it while it fits, falls back to a shuffle join at billion-key scale —
  * both are the right plan at their size), and exactly replayable in SQL.
  * Use [[sized]] to pick m ≈ 32·n (next power of two) for an ~7·10⁻⁴
  * false-positive rate at d=3, independent of corpus size.
  */
object BloomFilter {

  /** Next power of two ≥ 32·n — the self-sizing rule (load d·n/m = 3/32
    * at d=3). Matches the SQL spelling `POWER(2, CEIL(LOG2(32.0 * n)))`
    * exactly: 32·n ≤ 2^53 keeps the double exact, and log2 of a power of
    * two is exact IEEE, so the boundary case agrees. */
  def sized(n: Long): Long = {
    require(n > 0, "empty key set")
    val target = 32L * n
    java.lang.Long.highestOneBit(target) match {
      case hb if hb == target => hb
      case hb => hb << 1
    }
  }

  /** Hash position j of `key` in an m-bit filter. */
  def position(key: Column, j: Int, m: Long): Column =
    pmod(Det.hex60(md5(concat(key, lit(s"@$j")))), lit(m)).cast("long")

  /** [[position]] on xxhash64 instead of md5 — for PREFILTER composition
    * only (q38's shape), where the filter's verdict never reaches the
    * output: a bloom prefilter is a superset pass whatever the hash, so
    * the probe side can use the native codegen'd hash (~ns/row) instead
    * of paying 3 md5 hex strings per corpus row (~µs/row — measured 1.4×
    * of q38's whole sf10 wall). q82, whose CONTRACT is the sketch
    * itself, stays on the md5 family its DuckDB oracle replays. */
  def positionFast(key: Column, j: Int, m: Long): Column =
    pmod(xxhash64(key, lit(j)), lit(m)).cast("long")

  /** The filter itself: the distinct set-bit positions of `df`'s `keyCol`
    * under d hashes — ≤ m rows, one column `pos`. */
  def bits(df: DataFrame, keyCol: String, d: Int, m: Long): DataFrame =
    df.select(explode(array((0 until d).map(j =>
        position(col(keyCol), j, m)): _*)).as("pos"))
      .distinct()

  /** [[bits]] under the [[positionFast]] hash family — build and probe
    * must share the family. */
  def bitsFast(df: DataFrame, keyCol: String, d: Int, m: Long): DataFrame =
    df.select(explode(array((0 until d).map(j =>
        positionFast(col(keyCol), j, m)): _*)).as("pos"))
      .distinct()

  /** Membership probe: one row per `probe` row (identified by its unique
    * `idCol`), plus a `bloom_hit` column — true iff ALL d positions of
    * `keyCol` are set in `filter` ([[bits]]' output or a distinct-union
    * of several). No false negatives by construction. */
  def mightContain(probe: DataFrame, idCol: String, keyCol: String,
                   filter: DataFrame, d: Int, m: Long): DataFrame = {
    val hit = filter.withColumn("_set", lit(1))
    probe.select(col(idCol), col(keyCol))
      .withColumn("pos", explode(array((0 until d).map(j =>
        position(col(keyCol), j, m)): _*)))
      .join(hit, Seq("pos"), "left")
      .groupBy(col(idCol))
      .agg((min(coalesce(col("_set"), lit(0))) === 1).as("bloom_hit"))
  }

  /** DuckDB spelling of [[position]], kept beside the Spark twin. */
  object sql {
    def position(key: String, j: Int, m: String): String =
      s"(${Det.sql.hex60(s"md5($key || '@$j')")} % $m)"
  }
}
