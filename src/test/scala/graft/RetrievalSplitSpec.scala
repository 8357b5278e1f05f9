package graft

import graft.pipeline.Curation
import graft.queries.TextQueries

/** q79 BM25 vs an exhaustive JVM recompute, and the q80 leakage-safety
  * property (no near-dup cluster straddles a split) plus declared-vs-
  * pipeline parity, over the sf0.001 corpus. */
class RetrievalSplitSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q79 matches an exhaustive JVM BM25 top-10") {
    val qterms = Seq("data", "join", "stream")
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n.toDouble
    val dfs = qterms.map(t => toks.values.count(_.contains(t)))
    def score(id: Long): Double = {
      val w = toks(id)
      val dl = w.length.toDouble
      // same fixed-order sum as the declared query: s1 + s2 + s3
      qterms.zip(dfs).map { case (t, df) =>
        val tf = w.count(_ == t).toDouble
        val idf = math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
        idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
      }.foldLeft(0.0)(_ + _)
    }
    val expect = docs.map(_._1).map(id => id -> score(id))
      .sortBy { case (id, s) => (-s, id) }.take(10)

    val got = TextQueries.q79.build(spark, sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq == (1 to 10), "rnk must be 1..10")
    assert(got.map(_.getLong(1)).toSeq == expect.map(_._1),
      "top-10 doc order must match the JVM reference")
    got.zip(expect).foreach { case (r, (_, s)) =>
      assert(math.abs(r.getDouble(2) - s) <= 1e-12 * math.max(1.0, math.abs(s)),
        s"score mismatch at doc ${r.getLong(1)}: got ${r.getDouble(2)} want $s")
    }
  }

  test("q80 never lets a near-dup cluster straddle a split") {
    val got = TextQueries.q80.build(spark, sf0001).collect()
    assert(got.length == docs.size, "one split verdict per document")
    val byCluster = got.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_.getString(3)).toSet.size == 1,
        s"cluster $c straddles splits: ${rows.map(_.getString(3)).toSet}")
      assert(rows.forall(_.getLong(2) == rows.length),
        s"cluster_size must equal the cluster's row count for $c")
    }
    // all three splits must actually be populated on this corpus (the
    // shares are 80/10/10 over hundreds of clusters)
    assert(got.map(_.getString(3)).toSet == Set("train", "val", "test"))
    // doc-wise splitting WOULD leak on this corpus: some multi-doc cluster
    // exists, so the property above is not vacuous
    assert(byCluster.exists(_._2.length > 1), "corpus must contain near-dups")
  }

  test("Curation.leakageSafeSplit agrees with the declared q80 split") {
    val declared = TextQueries.q80.build(spark, sf0001)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = TextQueries.q80.build(spark, sf0001)
      .select("doc_id", "cluster_id")
    val piped = Curation.leakageSafeSplit(labels).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(piped == declared)
  }
}
