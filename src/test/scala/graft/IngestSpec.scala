package graft

import graft.pipeline._
import graft.sources.Sources
import graft.tensor.Tensors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end ingest: binary volume scan (S2 real DICOM decode) → per-frame
  * records → ED/ES detection → stack → canonicalize → DataModule lifecycle —
  * the full setup_cine → DataModule path (SURVEY §3.2 → §3.1) on synthetic
  * files, all as distributed DataFrame ops. */
class IngestSpec extends SparkSpec {

  test("binary files to served batches") {
    // 1. real (encoded) DICOM slices on disk — one per subject
    val dir = Files.createTempDirectory("ingest").toString
    (0 until 6).foreach { i =>
      val px = Array.tabulate(16)(j => ((i * 31 + j * 17) % 127).toFloat)
      Files.write(java.nio.file.Paths.get(f"$dir/mm1-s$i%02d.dcm"),
        graft.sources.Dicom.encode(4, 4, px, position = Seq(0f, 0f, i.toFloat)))
    }

    // 2. S1/S2 scan + real decode to per-subject volumes
    val vols = Sources.scanVolumes(spark, dir, "*.dcm", h = 4, w = 4)
      .withColumn("subject_id",
        regexp_extract(col("path"), "mm1-(s[0-9]+)", 1))
      .withColumn("dataset", lit("mm1"))

    // 3. replicate each volume into 4 frames with varying "foreground" to
    //    exercise ED/ES (frame f: threshold shifts the nonzero count)
    val frames = vols.select(col("subject_id"), col("dataset"),
      explode(sequence(lit(0), lit(3))).as("frame_nr"), col("volume"))
      .withColumn("frame_nr", col("frame_nr").cast("int"))
      .withColumn("label", Tensors.tensor(col("volume.shape"),
        transform(col("volume.data"), x =>
          when(x > col("frame_nr") * 40 + 60, lit(1.0f)).otherwise(lit(0.0f)))))

    val edEs = Reformat.detectEdEs(frames, "subject_id", "label")
    assert(edEs.count() == 6)
    val r0 = edEs.orderBy("subject_id").head()
    assert(r0.getAs[Long]("ed_volume") >= r0.getAs[Long]("es_volume"))

    // 4. stack ED/ES and canonicalize (crop + identity reorient)
    val stacked = Reformat.stackEdEs(frames, "subject_id", "label", edEs)
    assert(stacked.count() == 6)
    val shape = stacked.select(col("stacked.shape")).head().getSeq[Int](0)
    assert(shape.head == 2, s"ED+ES stack: $shape")

    // 5. full DataModule lifecycle over the ingested records
    val records = frames
      .groupBy("subject_id", "dataset")
      .agg(sort_array(collect_list(struct(col("frame_nr"), col("volume").as("v")))).as("fs"))
      .withColumn("image", Tensors.tensor(
        concat(array(lit(4), lit(1)), slice(element_at(col("fs"), 1)("v")("shape"), 3, 3)),
        flatten(transform(col("fs"), f => f("v")("data")))))
      .withColumn("label", col("image"))
      .drop("fs")
    val cfg = GraftConfig(datasetNames = Seq("mm1"), keyPairs = Map("image" -> "label"),
      dimensionality = "2D", targetSize = (4, 4), testPerGroup = 1,
      validFraction = 0.5, seed = 3L, batchSize = 4)
    val root = Files.createTempDirectory("ingestcache").toString
    val dm = DataModule(spark, cfg,
      records.select(col("subject_id"), lit("A").as("vendor")),
      records, root, imageCols = Seq("image"), labelCols = Seq("label")).setup()
    val train = dm.dataloader("train", epoch = 0)
    assert(train.count() > 0)
    assert(train.select(col("image.shape")).distinct().head().getSeq[Int](0) == Seq(1, 1, 1, 4, 4))
  }
}
