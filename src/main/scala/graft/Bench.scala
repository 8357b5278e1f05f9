package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/file-index initialization otherwise
    // lands on whichever query happens to run first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    var failed = 0
    // a query may leave persisted/localCheckpointed blocks behind (e.g.
    // q39's final label checkpoint, q44's signature persist — blocks the
    // query itself cannot free because the caller materializes them);
    // drop them so 50 queries in one JVM don't accumulate block-manager
    // state. Untimed: cleanup is bookkeeping, not query work. Blocking,
    // so async block cleanup can't overlap the next query's timed region.
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    // shared-box contention makes single-shot timings noisy (three rounds
    // of phantom "regressions" in a row); rerun each non-trivial query and
    // report the min — the min is the least-contended observation of the
    // same deterministic plan. Queries under 0.5 s skip the repeat so the
    // extra wall cost stays bounded.
    val benchReps = math.max(1,
      sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt)
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val secs =
        try {
          var best = once()
          var rep = 1
          while (rep < benchReps && best >= 0.5) {
            cleanup()
            best = math.min(best, once())
            rep += 1
          }
          best
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += 1
            -1.0
        }
      System.err.println(f"[bench] $name%-22s $secs%8.2f s")
      cleanup()
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    // a failed query's wall time is meaningless — a broken data dir must
    // grade as a broken run, not as a fast one
    if (failed > 0) {
      System.err.println(s"[bench] $failed queries FAILED — total is not a valid benchmark")
      sys.exit(1)
    }
  }
}
