package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_VERIFY_MASTER=local-cluster[2,2,2048] (VERDICT r16 item 3):
    // run the WHOLE declared suite on a real multi-process standalone
    // master — separate executor JVMs, isLocal=false — so every custom
    // Aggregator buffer encoder, codegen expression, and broadcast
    // crosses a real executor boundary (single-JVM local[*] cannot
    // surface serialization bugs). Executors are fresh JVMs and need
    // this (forked-run) JVM's classpath plus the JDK-17 add-opens that
    // spark-submit would inject; the invoking shell must set
    // SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark for the worker's
    // ExecutorRunner (same recipe as LocalClusterCkptSpec).
    val master = sys.env.getOrElse("GRAFT_VERIFY_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's cached-plan AQE flag so correctness runs the same
      // plan shape the bench times (see Bench.newSession)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    if (master.startsWith("local-cluster")) {
      builder
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar")
          .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" "))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY=q58_x,q59_y dumps a subset (same knob shape as
    // Bench's GRAFT_BENCH_ONLY) — check_oracle.py only compares the dump
    // dirs present, so a filtered run is a fast single-query gate.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free any persisted/checkpointed blocks the query left behind
      // (same hygiene as Bench — 50 queries share this JVM)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // emit only the SELECTED queries' oracles: check_oracle.py treats a
    // missing dump for any oracle key as a failure (the r17 gate-hole
    // fix), so a GRAFT_VERIFY_ONLY-filtered dump must carry a matching
    // filtered oracle set (the driver always runs unfiltered)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
