package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** [[JobProfile]] over a comma-separated query list in ONE JVM — the
  * per-query launch cost of an sbt runMain (~40 s) dwarfs the probe
  * itself when a round needs a dozen cells profiled. Same harness as the
  * bench (noop action, unpersist+clearCache between reps, schema-cache
  * warmup), reporting per rep: wall, Σ job wall, job/stage/task counts —
  * the out-of-job wall (wall − Σ jobs, minus overlap) is the
  * driver-floor number VERDICT r18 item 1 tracks.
  * Usage: runMain graft.tools.ProfileMany q44_x,q72_y [sfDir] [reps]
  */
object ProfileMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // experiment knob: GRAFT_PROFILE_CONF=key=val,key=val
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobWall = 0.0
    @volatile var jobN = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val verbose = sys.env.contains("GRAFT_PROFILE_VERBOSE")
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        t0s.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val w = (System.nanoTime() - t0s.getOrDefault(je.jobId, System.nanoTime())) / 1e9
        jobWall += w; jobN += 1
        if (verbose) println(f"[job] ${je.jobId}%3d $w%7.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    }
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try {
      Seq("customer", "orders", "lineitem", "part", "supplier", "nation",
        "region", "documents", "embeddings").foreach(t =>
        graft.Tables.table(spark, sfDir, t))
      graft.Tables.events(spark, sfDir)
    } catch { case _: Throwable => () }
    spark.sparkContext.addSparkListener(listener)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val walls = for (r <- 1 to reps) yield {
        jobWall = 0.0; jobN = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-24s rep $r: wall $wall%7.3f s  jobs $jobN%2d (sum ${jobWall}%7.3f s)  $stages stages  $tasks tasks")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        wall
      }
      println(f"[best]  $name%-24s ${walls.min}%7.3f s")
    }
    spark.stop()
  }
}
