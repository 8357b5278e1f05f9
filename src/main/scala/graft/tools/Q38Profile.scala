package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile for q38's sf10 wall (r13): times each layer of
  * the contamination pipeline separately so the optimization attacks the
  * measured block, not the assumed one. */
object Q38Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata_gen/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val words = split(col("text"), " ")
    val tris = transform(sequence(lit(1), size(words) - 2),
      i => concat_ws(" ", element_at(words, i), element_at(words, i + 1),
        element_at(words, i + 2)))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q38prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }
    val g = docs.select(col("doc_id"), explode(tris).as("tri"))
    val train = g.filter(col("doc_id") % 100 =!= 7)
    t("explode+count")(train.agg(count(lit(1))).head().getLong(0))
    t("explode+distinct")(train.distinct().count())
    val bench = g.filter(col("doc_id") % 100 === 7)
    val benchTris = bench.select("tri").distinct()
    t("bench distinct")(benchTris.count())
    val benchDocs = bench.select(col("doc_id").as("bench_doc"), col("tri"))
    // bloom-prefilter selectivity (VERDICT r13 item 2): the fraction of
    // raw training trigram rows the three semi-joins shed BEFORE any
    // shuffle. On the legacy 30-word corpus this is 0 by saturation
    // (addendum 6); on the Zipf corpus it is the number the prefilter
    // earns its keep with.
    locally {
      import graft.operators.BloomFilter
      val benchTris = bench.select("tri").distinct().persist()
      val m = BloomFilter.sized(math.max(1L, benchTris.count()))
      val bloom = BloomFilter.bitsFast(benchTris, "tri", 3, m)
      val t0 = System.nanoTime()
      val raw = train.agg(count(lit(1))).head().getLong(0)
      val kept = (0 until 3).foldLeft(train) { (acc, j) =>
        acc.join(broadcast(bloom.select(col("pos").as(s"_p$j"))),
          BloomFilter.positionFast(col("tri"), j, m) === col(s"_p$j"), "left_semi")
      }.agg(count(lit(1))).head().getLong(0)
      val pass = 100.0 * kept / math.max(1L, raw)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[q38prof] bloom prefilter: m=$m raw=$raw kept=$kept pass=$pass%.2f%% $secs%.2f s")
      benchTris.unpersist()
    }
    t("join expansion count")(
      train.distinct().join(broadcast(benchDocs), "tri").agg(count(lit(1))).head().getLong(0))
    t("full agg")(
      train.distinct().join(broadcast(benchTris), "tri")
        .join(broadcast(benchDocs), "tri")
        .groupBy("doc_id")
        .agg(countDistinct(col("tri")), countDistinct(col("bench_doc")))
        .count())
    spark.stop()
  }
}
