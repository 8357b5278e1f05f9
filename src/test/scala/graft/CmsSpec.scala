package graft

import graft.operators.CountMinSketch
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Count-min sketch laws over the sf0.001 corpus: one-sided error,
  * mergeability by addition, and partition invariance. */
class CmsSpec extends SparkSpec {

  private val (d, w) = (4, 64)

  private lazy val toks = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(explode(split(col("text"), " ")).as("term"))

  test("q81 estimates never undercount and mostly recover exact counts") {
    val got = TextQueries.q81.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) >= 0L,
        s"CMS undercounted '${r.getString(0)}': est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // d=4 rows over a ~30-term vocab in 64 buckets: the min over rows
    // recovers the exact count for at least half the vocabulary
    assert(got.count(_.getLong(3) == 0L) * 2 >= got.length)
  }

  test("counter matrices merge by addition") {
    val whole = CountMinSketch.counters(toks, "term", d, w)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // split the token stream arbitrarily; summed shard sketches must equal
    // the whole-corpus sketch exactly (counter sums commute)
    val withIdx = toks.withColumn("i", monotonically_increasing_id())
    val s1 = CountMinSketch.counters(withIdx.filter(col("i") % 2 === 0), "term", d, w)
    val s2 = CountMinSketch.counters(withIdx.filter(col("i") % 2 === 1), "term", d, w)
    val merged = s1.unionByName(s2)
      .groupBy("row", "bucket").agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("out-of-sketch probe terms estimate 0, never vanish or overestimate") {
    val keys = spark.range(50).select(concat(lit("in"), col("id")).as("term"))
    val cnt = CountMinSketch.counters(keys, "term", d, w)
    // probes disjoint from the sketched keys: with w=64 and 50 keys some
    // of their buckets are empty — the estimate must be 0 whenever ANY of
    // the d buckets is empty, and every probe must appear in the output
    val probes = spark.range(200).select(concat(lit("out"), col("id")).as("term"))
    val est = CountMinSketch.estimate(probes, "term", cnt, d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 200, "every probe term must get a verdict")
    assert(est.values.forall(_ >= 0L))
    assert(est.values.exists(_ == 0L),
      "some disjoint probe must hit an empty bucket at this load")
  }

  test("counters are partition invariant") {
    val p1 = CountMinSketch.counters(toks.repartition(1), "term", d, w)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val p7 = CountMinSketch.counters(toks.repartition(7), "term", d, w)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(p1 == p7)
  }
}
