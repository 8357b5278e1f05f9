package graft.pipeline

import graft.tensor.{Kernels, Tensors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ingest/reformat stage (SURVEY §3.2, `setup/reformat`): the
  * reference loops subjects single-threaded on the driver
  * (`mm1.py:40` `for … in tqdm(...)`); here each step is a DataFrame
  * operator so the per-subject work is the unit of parallelism —
  * "embarrassingly parallel; the loop the reference leaves on the table".
  */
object Reformat {

  /** A8/A9 ED/ES detection (`setup/reformat/utils.py:91-113`): per subject,
    * ED = annotated frame with max foreground volume, ES = min. Input: one
    * row per (subject, frame_nr) with a label tensor; conditional count
    * (A9: Σ mask>0) via an aggregate HOF, argmax/argmin with explicit
    * tiebreaks. Returns (subject, ed_frame, es_frame, ed_volume, es_volume). */
  def detectEdEs(frames: DataFrame, subjectCol: String, labelCol: String): DataFrame = {
    val vol = aggregate(col(s"$labelCol.data"), lit(0L),
      (acc, x) => acc + when(x > 0, 1L).otherwise(0L))
    val withVol = frames.withColumn("_gt_volume", vol)
    val wEd = Window.partitionBy(col(subjectCol))
      .orderBy(col("_gt_volume").desc, col("frame_nr"))
    val wEs = Window.partitionBy(col(subjectCol))
      .orderBy(col("_gt_volume").asc, col("frame_nr"))
    withVol
      .withColumn("_rk_ed", row_number().over(wEd))
      .withColumn("_rk_es", row_number().over(wEs))
      .groupBy(subjectCol)
      .agg(
        max(when(col("_rk_ed") === 1, col("frame_nr"))).as("ed_frame"),
        max(when(col("_rk_ed") === 1, col("_gt_volume"))).as("ed_volume"),
        max(when(col("_rk_es") === 1, col("frame_nr"))).as("es_frame"),
        max(when(col("_rk_es") === 1, col("_gt_volume"))).as("es_volume"))
  }

  /** J6 content-equality frame lookup (`setup/reformat/utils.py:76-89`):
    * find the time index of a 3-D frame inside the 4-D cine by exact
    * content equality — hash the buffers, join, min index. */
  def findFrameIndex(cine: DataFrame, subjectCol: String, frameCol: String,
                     probe: DataFrame, probeCol: String): DataFrame = {
    val hashed = cine.withColumn("_h", md5(to_json(col(frameCol))))
    val probeH = probe.withColumn("_h", md5(to_json(col(probeCol))))
      .select(col(subjectCol), col("_h"))
    hashed.join(probeH, Seq(subjectCol, "_h"))
      .groupBy(subjectCol)
      .agg(min(col("frame_nr")).as("matched_frame"))
  }

  /** J7 align-and-stack (`setup/reformat/utils.py:38-44`): stack the ED and
    * ES label volumes into one 2-frame tensor per subject. Self-join-free:
    * conditional aggregation over the (subject, frame) stream. */
  def stackEdEs(frames: DataFrame, subjectCol: String, labelCol: String,
                edEs: DataFrame): DataFrame = {
    val joined = frames.join(edEs, Seq(subjectCol))
      .filter(col("frame_nr") === col("ed_frame") || col("frame_nr") === col("es_frame"))
    val tagged = joined.withColumn("_slot",
      when(col("frame_nr") === col("ed_frame"), 0).otherwise(1))
    tagged.groupBy(subjectCol)
      .agg(
        sort_array(collect_list(struct(col("_slot"), col(labelCol).as("t")))).as("_stack"),
        first(col("ed_frame")).as("ed_frame"), first(col("es_frame")).as("es_frame"))
      .withColumn("stacked", Tensors.tensor(
        concat(array(lit(2)), slice(element_at(col("_stack"), 1)("t")("shape"), 2, 4)),
        flatten(transform(col("_stack"), s => s("t")("data")))))
      .drop("_stack")
  }

  /** The full per-subject reformat chain (`mm1.py:29-80` shape): border
    * crop → reorient to canonical axes → zoom/pixdim fix (T15: zooms from
    * affine column norms — here direct pixdim pass-through of the decoded
    * header). */
  def canonicalize(df: DataFrame, volCol: String, permutation: Seq[Int],
                   flips: Seq[Boolean]): DataFrame = {
    val cropped = df.withColumn(volCol, Tensors.borderCrop(col(volCol)))
    val r = Kernels.reorient(col(s"$volCol.shape"), col(s"$volCol.data"),
      typedLit(permutation), typedLit(flips))
    cropped.withColumn(volCol, struct(r("_1").as("shape"), r("_2").as("data")))
  }

  /** T15 zoom normalization (`setup/reformat/utils.py:11-15`): voxel
    * spacing = column norms of the 3×3 affine block (row-major 9-array). */
  def zoomsFromAffine(affine: Column): Column =
    transform(sequence(lit(0), lit(2)), j =>
      sqrt(
        pow(element_at(affine, (j + 1).cast("int")).cast("double"), 2) +
          pow(element_at(affine, (j + 4).cast("int")).cast("double"), 2) +
          pow(element_at(affine, (j + 7).cast("int")).cast("double"), 2)))
}
