package graft.operators

import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications") — the
  * bounded-memory FREQUENCY sketch, complementing [[KmvSketch]]'s
  * bounded-memory DISTINCT sketch: d hash rows × w counters, point
  * estimate `min_j c[j][h_j(x)]`, one-sided error (never underestimates;
  * overestimate ≤ εN with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉).
  *
  * Determinism (the property that makes it ORACLE-decidable, unlike
  * Spark's built-in CMS whose murmur seeding is engine-internal): row j's
  * bucket is `hex60(md5(term || '#j')) % w` — md5 and exact 60-bit integer
  * arithmetic both engines replay bit-for-bit ([[Det.hex60]]), and counter
  * sums commute, so the full counter matrix (and therefore every estimate)
  * is a pure function of the multiset of terms, independent of
  * partitioning, merge order, and engine.
  *
  * Scale shape: the counter matrix is d·w rows REGARDLESS of corpus size —
  * a map-side-combinable hash-agg, mergeable across shards/streams by
  * addition. [[counters]] pre-aggregates by term first (vocabulary-sized
  * hash-agg) and weights the bucket agg by the term count, which is
  * equivalent to hashing every occurrence but hashes each DISTINCT term
  * once — the d-way inflation applies to the vocab, not the corpus.
  */
object CountMinSketch {

  /** Row-j bucket of `term` in a width-`w` sketch. */
  def bucket(term: Column, j: Int, w: Int): Column =
    pmod(Det.hex60(md5(concat(term, lit(s"#$j")))), lit(w.toLong)).cast("int")

  /** The (row, bucket) → count counter matrix of `df`'s `termCol`
    * occurrences: d·w-row frame (`row`, `bucket`, `c`). */
  def counters(df: DataFrame, termCol: String, d: Int, w: Int): DataFrame = {
    val perTerm = df.groupBy(col(termCol).as("_t")).agg(count(lit(1)).as("_n"))
    val rows = explode(array((0 until d).map(lit): _*)).as("row")
    perTerm.select(col("_t"), col("_n"), rows)
      .withColumn("bucket",
        (0 until d).foldLeft(lit(-1)) { (acc, j) =>
          when(col("row") === j, bucket(col("_t"), j, w)).otherwise(acc)
        })
      .groupBy("row", "bucket").agg(sum(col("_n")).as("c"))
  }

  /** CMS point estimates for `probe`'s `termCol`: min over the d rows of
    * the matching counters. `cnt` must be [[counters]]' output (or a sum
    * of several — the sketch is mergeable by addition). Returns
    * (`termCol`, `est`). The join is LEFT with an empty bucket counting
    * as 0 — an out-of-sketch probe term must estimate 0, not vanish (all
    * d buckets empty) or overestimate (min over only the non-empty
    * buckets). */
  def estimate(probe: DataFrame, termCol: String, cnt: DataFrame,
               d: Int, w: Int): DataFrame = {
    val rows = explode(array((0 until d).map(lit): _*)).as("row")
    probe.select(col(termCol), rows)
      .withColumn("bucket",
        (0 until d).foldLeft(lit(-1)) { (acc, j) =>
          when(col("row") === j, bucket(col(termCol), j, w)).otherwise(acc)
        })
      .join(broadcast(cnt), Seq("row", "bucket"), "left")
      .groupBy(termCol).agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** DuckDB spellings of the same arithmetic, kept beside the Spark twins
    * (the [[Det.sql]] convention). */
  object sql {
    def bucket(term: String, j: Int, w: Int): String =
      s"(${Det.sql.hex60(s"md5($term || '#$j')")} % $w)"
  }
}
