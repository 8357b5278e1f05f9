package graft

import org.apache.spark.sql.SparkSession

/** Session factory (SURVEY §7.1): one place for the engine's Spark tuning.
  *
  * The settings encode the scale posture, not magic numbers:
  * - shuffle partitions sized to cores locally (a cluster deployment sets
  *   this to ~2-3× total executor cores, or leaves AQE coalescing to fix it)
  * - AQE on (runtime re-plan: skew-join splitting, dynamic broadcast,
  *   partition coalescing — SURVEY §4's "spill-aware" lever)
  * - UTC session timezone (oracle parity + cluster determinism)
  * - 128 MB file split target so wide-tensor parquet rows don't produce
  *   multi-GB tasks (SURVEY §7.4.3)
  */
object Session {

  def local(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
            appName: String = "graft"): SparkSession =
    tune(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .getOrCreate()

  /** Apply the engine's conf to any builder (cluster submit path). */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Wide-row (tensor-record) read tuning: the vectorized parquet reader
    * batches 4096 rows by default — at ~5 MB per cine record that is a
    * ~20 GB reservation per task. 8-row batches keep vectorization with a
    * ~40 MB-per-column ceiling, which also survives 32 concurrent tasks in
    * one local JVM. Call before scanning tensor-record parquet
    * (DatasetCacher.load does this); the narrow-scan default is restored by
    * `narrowRows`. */
  /** Vectorized-reader batch sizing for multi-MB tensor rows: the reader
    * materializes batchSize rows of EVERY projected column at once, so the
    * per-task working set is batchSize × row bytes. 8 suits ~1 MB rows
    * (64² cine); native 256² volumes are ~160 MB/row → batch 2 keeps a
    * 4-task local run inside a few GB. */
  def wideRows(spark: SparkSession, batch: Int = 8): Unit =
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", batch.toString)

  def narrowRows(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
}
