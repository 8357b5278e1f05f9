package graft

import graft.operators.BloomFilter
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Bloom-filter laws: no false negatives, union-distinct mergeability,
  * and the self-sizing boundary. */
class BloomSpec extends SparkSpec {

  test("sized picks the next power of two at and around the boundary") {
    assert(BloomFilter.sized(1) == 32)
    assert(BloomFilter.sized(2) == 64)
    assert(BloomFilter.sized(3) == 128)   // 96 -> 128
    assert(BloomFilter.sized(4) == 128)   // exact power stays
    assert(BloomFilter.sized(1000) == 32768)
  }

  test("q82 never false-negatives and its FP rate is sketch-sized") {
    val got = TextQueries.q82.build(spark, sf0001).collect()
    assert(got.length == 250, "one verdict per odd-half doc")
    got.foreach { r =>
      if (r.getBoolean(2)) assert(r.getBoolean(1),
        s"false negative at doc ${r.getLong(0)} — impossible by construction")
      assert(r.getBoolean(3) == (r.getBoolean(1) && !r.getBoolean(2)))
    }
    // load d*n/m = 3/32 at d=3 gives FP ~ 7e-4; allow generous slack on
    // 250 probes (expected 0.2 FPs — anything beyond a handful is a bug)
    assert(got.count(_.getBoolean(3)) <= 5)
  }

  test("filters merge by union-distinct") {
    val ids = spark.range(2000)
    def keysOf(d: org.apache.spark.sql.DataFrame) =
      d.select(md5(col("id").cast("string")).as("k"))
    val keys = keysOf(ids.toDF())
    val m = BloomFilter.sized(2000)
    val whole = BloomFilter.bits(keys, "k", 3, m)
      .collect().map(_.getLong(0)).toSet
    // shard deterministically by id parity: limit() without an ordering
    // is formally nondeterministic, so two limit-derived shards are not
    // guaranteed to partition the key set
    val h1 = BloomFilter.bits(keysOf(ids.filter(col("id") % 2 === 0).toDF()), "k", 3, m)
    val h2 = BloomFilter.bits(keysOf(ids.filter(col("id") % 2 === 1).toDF()), "k", 3, m)
    val merged = h1.unionByName(h2).distinct().collect().map(_.getLong(0)).toSet
    assert(merged == whole)
  }
}
