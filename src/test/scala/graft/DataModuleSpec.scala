package graft

import graft.pipeline._
import graft.tensor.Tensors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end lifecycle test mirroring the reference's own smoke script
  * (`tests/check_pipeline.py`): config → split → cache → train/valid
  * loaders → batch shapes, plus cache-hit reuse. */
class DataModuleSpec extends SparkSpec {

  private val cfg = GraftConfig(
    datasetNames = Seq("mm1"), keyPairs = Map("image" -> "label"),
    dimensionality = "2D", targetSize = (4, 4), nrClasses = 3, oneHot = true,
    testPerGroup = 2, validFraction = 0.25, seed = 11L, batchSize = 8,
    augment = AugmentConfig(enabled = true, rotationProb = 1.0, maxRotationDeg = 10))

  /** 20 subjects × (T=2,D=2) 4×4 volumes, two vendor groups. */
  private def subjects = spark.range(20).select(
    concat(lit("s"), col("id")).as("subject_id"),
    when(col("id") % 2 === 0, "A").otherwise("B").as("vendor"))

  // the HOF lambda must capture a *source* column (id), not an alias made in
  // the same projection — CollapseProject + lambda binding can't resolve the
  // latter (Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
  private def records = spark.range(20).select(
    concat(lit("s"), col("id")).as("subject_id"),
    lit("mm1").as("dataset"),
    Tensors.tensor(typedLit(Seq(2, 2, 1, 4, 4)),
      transform(sequence(lit(1), lit(64)),
        i => (i + col("id") % 100).cast("float"))).as("image"),
    Tensors.tensor(typedLit(Seq(2, 2, 1, 4, 4)),
      transform(sequence(lit(1), lit(64)), i => (i % 3).cast("float"))).as("label"))

  test("full lifecycle: setup → loaders → batch accounting → cache hit") {
    val root = Files.createTempDirectory("dm").toString
    val dm = DataModule(spark, cfg, subjects, records, root).setup()

    // split: 2 test per vendor group → 4 test, 16 dev
    val sm = DataSplit.summary(dm.split, "subject_id").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(sm("test") == 4 && sm("train") + sm("valid") == 16)
    assert(sm("valid") == math.floor(16 * 0.25 + 0.5).toLong)

    // cache: 16 dev subjects × 4 slices = 64 records, test subjects excluded
    val cached = DatasetCacher.load(spark, dm.cachePath)
    assert(cached.count() == 64)
    assert(cached.select("split").distinct().collect().map(_.getString(0)).toSet ==
      Set("train", "valid"))

    // train loader: augmented, batched, dropLast
    val train = dm.dataloader("train", epoch = 0)
    val nTrain = sm("train") * 4
    assert(train.count() == (nTrain / 8) * 8)
    val shapes = train.select(col("image.shape")).distinct().collect()
    assert(shapes.length == 1 && shapes(0).getSeq[Int](0) == Seq(1, 1, 1, 4, 4))
    val lblShape = train.select(col("label.shape")).head().getSeq[Int](0)
    assert(lblShape == Seq(1, 1, 3, 4, 4), "one-hot label in loader output")

    // valid loader is un-augmented → epoch-stable content
    val v1 = dm.dataloader("valid", 0).select(col("file_id"), col("image.data")).collect()
    val v2 = dm.dataloader("valid", 0).select(col("file_id"), col("image.data")).collect()
    assert(v1.map(_.toString).sorted.toSeq == v2.map(_.toString).sorted.toSeq)

    // second setup = cache hit (same fingerprint path)
    val p1 = dm.cachePath
    val dm2 = DataModule(spark, cfg, subjects, records, root).setup()
    assert(dm2.cachePath == p1)

    // weighted loader draws the requested count
    val w = dm.weightedDataloader("train", 0, Seq("dataset"), draws = 32)
    assert(w.count() == 32)
  }
}
