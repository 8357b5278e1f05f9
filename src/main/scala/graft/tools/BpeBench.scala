package graft.tools

/** BPE trainer cost at corpus scale: trains N merges on the sfDir's
  * documents and prints one JSON line — BASELINE.md's evidence that the
  * trainer is practical, not just spec-green.
  *
  * Default mode is the production path (`trainMergesFast`: distributed
  * dict scan + in-memory trainer in one executor task — merge cost is
  * heap/index updates, not a Spark job per merge). Pass `slow` to time
  * the one-job-per-merge distributed-argmax reference instead.
  *
  * Usage: runMain graft.tools.BpeBench <sfDir> [nMerges] [slow] [pack]
  * `pack` additionally tokenizes + packs the corpus WITH THE TRAINED
  * vocab (greedy longest-match segmentation feeding q69's two-phase
  * prefix sum) and reports that wall too — the "trained vocab drives the
  * production packing knob" measurement, not just trainer cost.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(32)
    val slow = args.contains("slow")
    val pack = args.contains("pack")
    val spark = graft.Session.local(appName = "graft-bpe-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val merges =
      if (slow) graft.operators.Bpe.trainMerges(docs, nMerges)
      else graft.operators.Bpe.trainMergesFast(docs, nMerges)
    val wall = (System.nanoTime() - t0) / 1e9
    val head = merges.take(8).map { case (a, b) => s""""$a+$b"""" }.mkString("[", ",", "]")
    val mode = if (slow) "slow" else "fast"
    println(f"""{"metric":"bpe_train","mode":"$mode","docs":$nDocs%d,"merges":${merges.length}%d,"wall_sec":$wall%.2f,"sec_per_merge":${wall / math.max(1, merges.length)}%.4f,"head":$head,"sf":"$sfDir"}""")
    if (pack) {
      import org.apache.spark.sql.functions._
      val vocab = graft.operators.Bpe.vocabOf(merges)
      val nUnits = vocab.map(_._2.size).sum
      val t1 = System.nanoTime()
      val counts = graft.operators.Subword.docCounts(docs, vocab)
        .select(col("doc_id"), col("n_subwords").as("n")).persist()
      val packed = graft.queries.TextQueries.packOffsets(counts)
      val nChunks = packed.agg(countDistinct(expr("start_offset DIV 2048"))).head().getLong(0)
      val packWall = (System.nanoTime() - t1) / 1e9
      val toks = counts.agg(sum(col("n"))).head().getLong(0)
      println(f"""{"metric":"bpe_pack","vocab_units":$nUnits%d,"docs":$nDocs%d,"subword_tokens":$toks%d,"bins":$nChunks%d,"pack_wall_sec":$packWall%.2f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
