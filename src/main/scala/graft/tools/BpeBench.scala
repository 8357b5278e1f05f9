package graft.tools

/** BPE trainer cost at corpus scale: trains N merges on the sfDir's
  * documents and prints one JSON line — BASELINE.md's evidence that the
  * trainer (one hash-agg + TakeOrdered(1) Spark job per merge over the
  * word-frequency DICT, not the corpus) is practical, not just spec-green.
  *
  * Usage: runMain graft.tools.BpeBench <sfDir> [nMerges]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.Session.local(appName = "graft-bpe-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.trainMerges(docs, nMerges)
    val wall = (System.nanoTime() - t0) / 1e9
    val head = merges.take(8).map { case (a, b) => s""""$a+$b"""" }.mkString("[", ",", "]")
    println(f"""{"metric":"bpe_train","docs":$nDocs%d,"merges":${merges.length}%d,"wall_sec":$wall%.2f,"sec_per_merge":${wall / math.max(1, merges.length)}%.2f,"head":$head,"sf":"$sfDir"}""")
    spark.stop()
  }
}
