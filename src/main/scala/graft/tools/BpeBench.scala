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

  /** `synth <nWords> <nMerges>`: time [[graft.operators.Bpe.trainDict]]
    * alone on a REALISTIC word-frequency dictionary — the trained-vocab
    * scale evidence the sf corpora cannot give (their generator draws
    * from ~100 distinct words, so pair merges exhaust at ~90; a real
    * corpus's dict is ~10^5-10^7 words and 32k merges deep). Words are
    * deterministic syllable compositions (so adjacent pairs share
    * substructure, as real language does) with Zipf counts; the trainer
    * input is exactly what one corpus scan produces, so this isolates
    * the per-merge cost that was 0.3 s/merge in the one-job-per-merge
    * shape. */
  private def synthDict(nWords: Int): Iterator[(String, Long)] = {
    val onsets = Array("b", "c", "d", "f", "g", "h", "j", "k", "l", "m",
      "n", "p", "r", "s", "t", "v", "w", "z", "st", "tr", "ch", "sh")
    val nuclei = Array("a", "e", "i", "o", "u", "ai", "ea", "ou")
    val codas = Array("", "n", "r", "s", "t", "l", "m", "nd", "st")
    def h(x: Long): Long = { // splitmix64 — deterministic, platform-free
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def syl(x: Long): String =
      onsets((h(x) % onsets.length).toInt.abs) +
        nuclei((h(x * 31 + 7) % nuclei.length).toInt.abs) +
        codas((h(x * 17 + 3) % codas.length).toInt.abs)
    (0 until nWords).iterator.map { i =>
      val n = 1 + (h(i.toLong * 13 + 1) % 4).toInt.abs
      val w = (0 until n).map(j => syl(i.toLong * 5 + j)).mkString
      // Zipf-ish counts: rank r gets ~nWords/r
      (w, math.max(1L, nWords.toLong / (i + 1)))
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("synth")) {
      val nWords = args.lift(1).map(_.toInt).getOrElse(100000)
      val nMerges = args.lift(2).map(_.toInt).getOrElse(32000)
      // distinct-ify (syllable compositions collide): dict semantics
      val dict = synthDict(nWords).toSeq.groupBy(_._1)
        .map { case (w, xs) => (w, xs.map(_._2).sum) }
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.trainDict(dict.iterator, nMerges)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"bpe_train_synth","dict_words":${dict.size}%d,"merges":${merges.length}%d,"wall_sec":$wall%.2f,"sec_per_merge":${wall / math.max(1, merges.length)}%.6f}""")
      return
    }
    if (args.headOption.contains("fixture")) {
      // regenerate the checked-in trained-vocab fixture
      // (src/main/resources/graft/bpe_merges_trained.txt — see
      // operators.TrainedBpe): synthDict's realistic Zipf dictionary at
      // real merge depth (the sf corpora exhaust pair merges at ~90).
      // Deliberately NOT seeded with the corpus generator's words —
      // seeding makes every corpus word a whole unit and the declared
      // q86 degenerates to n_sub = 1 everywhere; training on a disjoint
      // dictionary is the realistic cross-domain application and gives
      // corpus words non-trivial multi-unit segmentations.
      // Deterministic end-to-end: same dict, same tie rules, same file.
      val nWords = args.lift(1).map(_.toInt).getOrElse(100000)
      val nMerges = args.lift(2).map(_.toInt).getOrElse(1500)
      val out = args.lift(3).getOrElse(
        "src/main/resources/graft/bpe_merges_trained.txt")
      val dict = synthDict(nWords).toSeq
        .groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.trainDict(dict.iterator, nMerges)
      val wall = (System.nanoTime() - t0) / 1e9
      val body = merges.map { case (a, b) => s"$a\t$b" }.mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        body.getBytes("UTF-8"))
      println(f"""{"metric":"bpe_fixture","dict_words":${dict.size}%d,"merges":${merges.length}%d,"wall_sec":$wall%.2f,"out":"$out"}""")
      return
    }
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
