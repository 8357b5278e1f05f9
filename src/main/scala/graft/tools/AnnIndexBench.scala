package graft.tools

/** Build-once/serve-many cost of the persistent IVF-PQ index
  * (pipeline/AnnIndex) vs the in-query AnnServing path that retrains per
  * call — the number behind BASELINE.md's "a composed pipeline trains
  * once" sentence.
  *
  * Usage: runMain graft.tools.AnnIndexBench <sfDir> [indexDir]
  */
object AnnIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_gen/sf1")
    val indexDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("annindex").toString)
    val spark = graft.Session.local(appName = "graft-annindex-bench")
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildS) = timed {
      graft.pipeline.AnnIndex.build(spark, sfDir, indexDir)
    }
    // serve three times: first pays file-index warmup, min is steady state
    val serves = (1 to 3).map { _ =>
      timed(graft.pipeline.AnnIndex.search(spark, sfDir, indexDir).count())._2
    }
    val (_, inQueryS) = timed {
      graft.queries.AnnServing.ivfPqTopK(spark, sfDir).count()
    }
    println(f"""{"metric":"ann_index","build_sec":$buildS%.2f,"serve_secs":[${serves.map(x => f"$x%.2f").mkString(",")}],"serve_min_sec":${serves.min}%.2f,"in_query_sec":$inQueryS%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
