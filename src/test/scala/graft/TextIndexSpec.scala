package graft

import graft.pipeline.TextIndex
import graft.queries.Bm25
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persistent inverted index must serve scores BIT-EQUAL to the
  * corpus-scan BM25 arm — same termScore expression, same textual op
  * order — and its postings layout must be term-prunable. */
class TextIndexSpec extends SparkSpec {

  test("index-served top-k is bit-equal to the corpus-scan arm") {
    val dir = Files.createTempDirectory("textindex").toString
    TextIndex.build(spark, Tables.documents(spark, sf0001), dir)
    val served = TextIndex.search(spark, dir, Bm25.qterms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val arm = Bm25.scored(spark, sf0001)
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.length == 20)
    assert(served.toSeq == arm.toSeq,
      "index-served scores drifted from the scan arm")
  }

  test("a query's term filter is scan-pushed onto the clustered postings") {
    val dir = Files.createTempDirectory("textindex2").toString
    TextIndex.build(spark, Tables.documents(spark, sf0001), dir)
    val probe = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin("data", "join"))
    val scan = probe.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("In(term") || scan.contains("EqualTo(term"),
      s"term filter not pushed:\n$scan")
  }

  test("append then search equals a from-scratch rebuild, bit for bit") {
    val docs = Tables.documents(spark, sf0001)
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val fresh = docs.filter(col("doc_id") % 3 === 0)
    val incDir = Files.createTempDirectory("textindex-inc").toString
    TextIndex.build(spark, old, incDir)
    TextIndex.append(spark, fresh, incDir)
    val fullDir = Files.createTempDirectory("textindex-full").toString
    TextIndex.build(spark, docs, fullDir)
    def top(dir: String) = TextIndex.search(spark, dir, Bm25.qterms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(incDir) == top(fullDir),
      "appended index drifted from the rebuild")
  }

  test("absent query terms score zero contribution, not an error") {
    val dir = Files.createTempDirectory("textindex3").toString
    TextIndex.build(spark, Tables.documents(spark, sf0001), dir)
    val r = TextIndex.search(spark, dir,
      Seq("data", "zzz_not_a_term_zzz"), k = 5).collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }
}
