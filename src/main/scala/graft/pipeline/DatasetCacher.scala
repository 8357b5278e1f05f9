package graft.pipeline

import graft.util.Det
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The cache stage (`pipeline/dataset_cacher.py`): materialize a derived
  * dataset keyed by an MD5 fingerprint of (config ⨯ subject set), serve
  * identical requests from cache (S5/S11, SURVEY §4 row 1).
  *
  * Replaces one-`.pt`-file-per-slice with a Parquet dataset partitioned by
  * `dataset` (S5 mapping) plus a `_manifest` parquet — at 100 TB the
  * partitioned layout gives partition pruning on dataset and splits write
  * parallelism across executors; the driver only computes the fingerprint.
  */
object DatasetCacher {

  /** F5 cache identity (`dataset_cacher.py:103-127`): md5 over the config
    * canonical string + the sorted dataset-subject list. Computed
    * distributed (sort_array(collect_list)) then fetched — the collect is a
    * single md5 string, not data. */
  def fingerprint(config: GraftConfig, subjects: DataFrame, idCol: String): String = {
    val ids = subjects.agg(
      md5(concat_ws(",",
        lit(GraftConfig.canonical(config)),
        concat_ws(",", sort_array(collect_list(col(idCol).cast("string"))))))
        .as("fp"))
    ids.head().getString(0)
  }

  def cachePath(root: String, config: GraftConfig, fp: String): String = {
    val dim = config.dimensionality.toLowerCase
    s"$root/dev$dim-${config.datasetNames.sorted.mkString("_")}-$fp"
  }

  /** S11 cache-existence probe (`dataset_cacher.py:67-76`): skip
    * materialization when the manifest exists, unless overwrite. */
  def isCached(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(s"$path/_manifest")
    hPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hPath)
  }

  /** Materialize `records` (already transformed by the cache plan) under
    * the fingerprinted path, partitioned by `dataset`; write the manifest
    * (S6's consolidated CSV analog) from the non-tensor columns.
    *
    * @return the cache path (whether written now or served from cache)
    */
  def materialize(spark: SparkSession, records: DataFrame, metaCols: Seq[String],
                  root: String, config: GraftConfig, subjects: DataFrame,
                  idCol: String, overwrite: Boolean = false): String = {
    val fp = fingerprint(config, subjects, idCol)
    val path = cachePath(root, config, fp)
    // overwrite deletes the stale tree first (reformat_check flow) so
    // partitions from a previous run can't linger next to the new write
    if (needsMaterialize(spark, path, overwrite)) {
      records.write.mode(SaveMode.Overwrite)
        .partitionBy("dataset").parquet(s"$path/records")
      // manifest from the records JUST written, not from `records` again: a
      // second reference re-executes the plan (even column-pruned it
      // re-scans the source), and reading back the written files both
      // avoids that and guarantees the manifest describes exactly what was
      // materialized. Column-pruned scan — tensor data never leaves disk.
      // Schema pinned from `records`: partition-column type inference would
      // otherwise re-derive `dataset` from directory names, flipping a
      // numeric-looking dataset name from string to int in the manifest.
      val metaSchema = org.apache.spark.sql.types.StructType(
        metaCols.map(c => records.schema(c)))
      spark.read.schema(metaSchema).parquet(s"$path/records")
        .select(metaCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/_manifest")
    }
    path
  }

  /** T12 `LoadCachedDatad` read side: scan the cached records (wide rows →
    * small vectorized batches, see Session.wideRows). */
  def load(spark: SparkSession, path: String): DataFrame = {
    graft.Session.wideRows(spark)
    spark.read.parquet(s"$path/records")
  }

  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest")

  /** Recursive cache-folder delete (`setup/reformat/reformat.py:7-77`
    * `reformat_check` overwrite flow): drop a stale fingerprinted cache
    * directory through the Hadoop FS API (local/HDFS/object stores).
    * Guarded to paths that look like caches ([[cachePath]] layout) so a
    * mis-wired root cannot recursively delete arbitrary directories.
    * @return true iff something was deleted */
  def deleteCache(spark: SparkSession, path: String): Boolean = {
    require(new org.apache.hadoop.fs.Path(path).getName.matches("dev[23]d-.+-[0-9a-f]{32}"),
      s"refusing to recursively delete non-cache path: $path")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hPath) && fs.delete(hPath, true)
  }

  /** `reformat_check` shape: probe + optional overwrite in one call —
    * returns true when the cache is absent (caller should materialize),
    * deleting a stale cache first when overwrite is requested. */
  def needsMaterialize(spark: SparkSession, path: String, overwrite: Boolean): Boolean = {
    if (overwrite) deleteCache(spark, path)
    overwrite || !isCached(spark, path)
  }
}
