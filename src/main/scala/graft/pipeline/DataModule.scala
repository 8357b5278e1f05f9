package graft.pipeline

import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The primary user-facing entry point, mirroring the reference's
  * `DataModule(config)` → `setup()` → `train_dataloader()` lifecycle
  * (SURVEY §3.1, `pipeline/data_module.py`): one object owns split → cache →
  * serve, so a qcardia-data user maps their workflow 1:1.
  *
  * {{{
  * val dm = DataModule(spark, config, subjects, records, cacheRoot)
  * dm.setup()                       // split + fingerprint + materialize (or cache hit)
  * val train = dm.dataloader("train", epoch = 0)   // augmented, shuffled, batched
  * val valid = dm.dataloader("valid", epoch = 0)   // un-augmented
  * }}}
  */
final case class DataModule(
    spark: SparkSession,
    config: GraftConfig,
    subjects: DataFrame, // one row per subject: idCol + groupCol + meta
    records: DataFrame, // raw records: subject id, dataset, tensor columns
    cacheRoot: String,
    idCol: String = "subject_id",
    imageCols: Seq[String] = Seq("image"),
    labelCols: Seq[String] = Seq("label")) {

  private var splitDf: DataFrame = _
  private var cachePathV: String = _

  def split: DataFrame = { require(splitDf != null, "call setup() first"); splitDf }
  def cachePath: String = { require(cachePathV != null, "call setup() first"); cachePathV }

  /** split + cache-or-hit (stages "split…execute cache" of SURVEY §3.1). */
  def setup(overwrite: Boolean = false): DataModule = {
    splitDf = DataSplit.split(subjects, idCol, config.splitGroupCol,
      config.testPerGroup, config.validFraction, config.seed)
    val devSubjects = splitDf.filter(col("split").isin("train", "valid"))
    val devRecords = records.join(
      broadcast(devSubjects.select(col(idCol), col("split"))), Seq(idCol))
    val cached = TransformPlanner.cachePlan(config, imageCols, labelCols,
      recordKeyCols = Seq("dataset", idCol))(devRecords)
      .withColumn("file_id", concat_ws("-",
        col("dataset"), col(idCol), format_string("%02d", col("slice_nr")),
        format_string("%02d", col("frame_nr"))))
    cachePathV = DatasetCacher.materialize(spark, cached,
      Seq("file_id", idCol, "dataset", "split", "frame_nr", "slice_nr",
        "total_nr_frames", "total_nr_slices"),
      cacheRoot, config, devSubjects.select(col(idCol)), idCol, overwrite)
    this
  }

  /** One epoch of served batches for a split (stages "compile serve
    * plan…execute serve"): cached scan → serve transforms (augmented for
    * train) → epoch-seeded shuffle + batch ids (+ optional weighted
    * resampling via BatchServer.weightedDraw at the call site). */
  def dataloader(whichSplit: String, epoch: Long): DataFrame = {
    val cached = DatasetCacher.load(spark, cachePath)
      .filter(col("split") === whichSplit)
    val augmented = whichSplit == "train"
    val served = TransformPlanner.servePlan(config, imageCols, labelCols,
      "file_id", augmented, epoch)(cached)
    BatchServer.shuffledBatches(served, "file_id", epoch,
      config.batchSize, config.dropLast)
  }

  /** Weighted variant (`pipeline/data_module.py:146-157`): inverse-frequency
    * balanced draw over `weightCols`, then serve. */
  def weightedDataloader(whichSplit: String, epoch: Long, weightCols: Seq[String],
                         draws: Int): DataFrame = {
    val cached = DatasetCacher.load(spark, cachePath)
      .filter(col("split") === whichSplit)
    val weighted = BatchServer.inverseFrequencyWeights(cached, weightCols)
    val drawn = BatchServer.weightedDraw(weighted, "file_id", draws, config.seed + epoch)
    TransformPlanner.servePlan(config, imageCols, labelCols,
      "file_id", augmented = whichSplit == "train", epoch = epoch)(drawn)
  }
}
