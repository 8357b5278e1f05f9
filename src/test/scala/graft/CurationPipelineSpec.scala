package graft

import graft.pipeline.Curation
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

/** Production twins of q77/q78: Curation batch APIs, the streaming
  * decontaminator, and the Main `decontaminate` verb. */
class CurationPipelineSpec extends SparkSpec {

  test("Curation.decontaminate matches declared q77 on its contract split") {
    val docs = Tables.documents(spark, sf0001)
    val report = Curation.decontaminate(
      docs.where(col("doc_id") % 37 =!= 0),
      docs.where(col("doc_id") % 37 === 0))
    val q77 = graft.queries.CurationQueries.q77.build(spark, sf0001)
    val a = report.orderBy("doc_id").collect().toSeq
    val b = q77.collect().toSeq
    assert(a == b, s"pipeline twin diverged: $a vs $b")
  }

  test("streaming decontaminate: batch-parity verdicts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val bench = Curation.benchmarkGramSet(docs.where(col("doc_id") % 37 === 0))
    assert(bench.nonEmpty)

    // expected: the batch report (contaminated docs only)
    val expect = Curation.decontaminate(
      docs.where(col("doc_id") % 37 =!= 0),
      docs.where(col("doc_id") % 37 === 0))
      .select("doc_id", "n_grams", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val train = docs.where(col("doc_id") % 37 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (first, rest) = train.splitAt(train.size / 2)

    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bench)
    val q = out.writeStream.format("memory")
      .queryName("decontam_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(rest: _*)
      q.processAllAvailable()
      val rows = spark.table("decontam_out")
        .as[StreamingOps.ContamVerdict].collect()
      assert(rows.length == train.size, "one verdict per doc")
      val flagged = rows.filter(_.nShared > 0)
        .map(v => (v.docId, v.nGrams, v.nShared)).toSet
      assert(flagged == expect,
        s"streaming verdicts diverge from batch: $flagged vs $expect")
    } finally q.stop()
  }

  test("Curation.mixtureSample hits the q78 per-stratum counts") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val budget = n * 3 / 4
    val targets = Seq("en", "de", "es", "fr", "zh").map(_ -> 0.2).toMap
    val sampled = Curation.mixtureSample(docs, "lang", targets, budget, "q78")
    val got = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q78 = graft.queries.CurationQueries.q78.build(spark, sf0001)
      .select("lang", "n_sampled")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == q78, s"pipeline twin diverged: $got vs $q78")
    // sampled frame keeps the source schema (plus rate)
    assert(sampled.columns.toSet ==
      (docs.columns.toSet + "rate"), sampled.columns.mkString(","))
  }

  test("graft.Main decontaminate: YAML-driven end-to-end") {
    val root = Files.createTempDirectory("graft-decontam").toString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    docs.where(col("doc_id") % 37 =!= 0).write.parquet(s"$root/train")
    docs.where(col("doc_id") % 37 === 0).write.parquet(s"$root/bench")
    val yaml =
      s"""paths:
         |  documents: $root/train
         |  benchmarks: $root/bench
         |  output: $root/out
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$root/config.yaml"), yaml)

    val res = Main.run(spark, s"$root/config.yaml", "decontaminate")
    val written = spark.read.parquet(s"$root/out/decontaminate")
    assert(res("contaminated").toLong == written.count())
    assert(res("contaminated").toLong >= 1, res.toString)
    assert(written.where(col("contamination") > 1.0).count() == 0)
    assert(res("worst_doc") != "-")
  }

  test("Curation.linearScore with q84's hash weights equals declared q84") {
    val docs = Tables.documents(spark, sf0001)
    // materialize q84's hash-derived weights as a (term, weight) model
    // frame — the shape a real trained classifier arrives in
    val vocab = docs.select(explode(split(col("text"), " ")).as("term")).distinct()
    val weights = vocab.select(col("term"),
      (pmod(graft.util.Det.hex60(md5(concat(col("term"), lit("#w84")))),
        lit(17L)) - 8L).as("weight"))
    val piped = Curation.linearScore(docs, weights)
      .orderBy("doc_id").collect().toSeq
    val declared = graft.queries.CurationQueries.q84.build(spark, sf0001)
      .collect().toSeq
    assert(piped == declared)
  }

  test("LmModel train-once/score-many equals declared q89 on the training corpus; " +
    "OOV scoring is defined and finite") {
    import graft.pipeline.LmModel
    val docs = Tables.documents(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    LmModel.build(spark, docs, dir)
    val piped = LmModel.score(spark, docs, dir)
      .orderBy("doc_id").collect().toSeq
    val declared = graft.queries.LmQueries.q89.build(spark, sf0001)
      .collect().toSeq
    assert(piped.size == declared.size)
    // integers exact; the per-doc avg(logp) is summation-order-sensitive
    // at the ulp level (different join plans fold in different orders),
    // so doubles compare at 1e-9 — far tighter than the driver's
    // 6-decimal oracle rounding that makes q89 itself hash-stable
    piped.zip(declared).foreach { case (p, q) =>
      assert(p.getLong(0) == q.getLong(0) && p.getInt(1) == q.getInt(1))
      assert(math.abs(p.getDouble(2) - q.getDouble(2)) < 1e-9)
      assert(math.abs(p.getDouble(3) - q.getDouble(3)) < 1e-9)
    }
    // an out-of-domain corpus: unseen contexts/bigrams score through the
    // smoothing floor, finite and higher-perplexity than in-domain
    import spark.implicits._
    val alien = Seq((1L, "zz qq zz qq ww"), (2L, "spark table zz"))
      .toDF("doc_id", "text")
    val scored = LmModel.score(spark, alien, dir)
      .orderBy("doc_id").collect()
    assert(scored.length == 2)
    scored.foreach { r =>
      val pp = r.getAs[Double]("perplexity")
      assert(!pp.isNaN && !pp.isInfinite && pp > 0)
    }
    // exact smoothing-floor property: every bigram of a fully-OOV doc
    // scores P = (0+1)/(0+V), so its perplexity is exactly V
    val vocab = spark.read.parquet(s"$dir/meta").head().getLong(0)
    assert(math.abs(scored(0).getAs[Double]("perplexity") - vocab) < 1e-9,
      s"all-OOV perplexity must equal the vocabulary size $vocab")
  }
}
