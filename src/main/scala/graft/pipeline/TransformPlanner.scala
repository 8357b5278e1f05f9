package graft.pipeline

import graft.tensor.{AffineParams, Kernels, Tensors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The planner (`pipeline/transforms/compose.py:26-234` `build_transform`):
  * compiles a GraftConfig into a `DataFrame => DataFrame` chain. The
  * reference conditionally assembles MONAI dict transforms; here each
  * transform is a Column rewrite of the tensor struct, so the whole chain
  * collapses into one Catalyst projection — record-at-a-time fusion for
  * free via whole-stage codegen (SURVEY §4 "fused transform chain").
  *
  * Null tolerance (`allow_missing_keys`, P9): a key pair mapped to "none"
  * simply contributes no column rewrites — decided at plan-construction
  * time, like the reference's `if` chain.
  */
object TransformPlanner {

  /** The *cache* plan (`dataset_cacher.py:190-276` `_get_cache_transform`):
    * ensure5d → min-shift → per-image stats meta → explode to 2D/3D
    * (+ special-mode frame filter pushed below the sink, §4 row 2).
    * `keyCol` is the record key used for seeded draws. */
  def cachePlan(config: GraftConfig, imageCols: Seq[String], labelCols: Seq[String]): DataFrame => DataFrame = { df0 =>
    var df = df0
    (imageCols ++ labelCols).foreach { c =>
      df = df.withColumn(c, Tensors.ensure5d(col(c)))
    }
    imageCols.foreach { c =>
      // kernel fast path: cache inputs are full 4-D cine buffers (10⁶+
      // elements) — interpreted HOFs are 10-100× slower there (see
      // Kernels.bufferStats scaladoc)
      val st = Kernels.bufferStats(col(s"$c.data"))
      df = df.withColumn(s"${c}_meta",
        struct(st("_1").as("amin"), st("_2").as("amax"), st("_3").as("mean"),
          st("_4").as("std"), st("_5").as("numel")))
      df = df.withColumn(c, Tensors.tensor(col(s"$c.shape"),
        Kernels.shiftScale(col(s"$c.data"), -col(s"${c}_meta.amin"), lit(1.0))))
      // meta reflects the shifted buffer the record stores (min = 0), like
      // the reference which computes stats after ProcessIntensityd
      df = df.withColumn(s"${c}_meta", struct(
        lit(0.0).as("amin"),
        (col(s"${c}_meta.amax") - col(s"${c}_meta.amin")).as("amax"),
        (col(s"${c}_meta.mean") - col(s"${c}_meta.amin")).as("mean"),
        col(s"${c}_meta.std").as("std"), col(s"${c}_meta.numel").as("numel")))
    }
    labelCols.foreach { c =>
      df = df.withColumn(s"${c}_present_classes", Kernels.presentClasses(col(s"$c.data")))
    }
    // explode on the first image key's geometry; sibling keys share shape
    val primary = imageCols.headOption.getOrElse(labelCols.head)
    df = config.dimensionality match {
      case "3D" => explodeAll3d(df, primary, imageCols ++ labelCols)
      case _    => explodeAll2d(df, primary, imageCols ++ labelCols)
    }
    // special_mode frame filter (`dataset_cacher.py:346-353`): ED is frame 0
    // after the reference's ED-relative renumber (W3)
    config.specialMode match {
      case Some("ed_only") => df.filter(col("frame_nr") === 0)
      case Some("es_only") => df.filter(col("frame_nr") === col("total_nr_frames") / 2)
      case _ => df
    }
  }

  /** explode every tensor key with the same (T,D) geometry in lockstep. */
  private def explodeAll2d(df0: DataFrame, primary: String, keys: Seq[String]): DataFrame = {
    val t = col(primary)
    val tDim = element_at(t("shape"), 1); val dDim = element_at(t("shape"), 2)
    var df = df0
      .withColumn("total_nr_frames", tDim.cast("int"))
      .withColumn("total_nr_slices", dDim.cast("int"))
      .withColumn("_idx", explode(sequence(lit(0), tDim * dDim - 1)))
      .withColumn("frame_nr", expr("_idx DIV total_nr_slices").cast("int"))
      .withColumn("slice_nr", (col("_idx") % col("total_nr_slices")).cast("int"))
    keys.foreach { k =>
      val kt = col(k)
      val bs = element_at(kt("shape"), 3) * element_at(kt("shape"), 4) * element_at(kt("shape"), 5)
      df = df.withColumn(k, Tensors.tensor(
        concat(array(lit(1), lit(1)), slice(kt("shape"), 3, 3)),
        slice(kt("data"), col("_idx") * bs + 1, bs)))
    }
    df.drop("_idx")
  }

  private def explodeAll3d(df0: DataFrame, primary: String, keys: Seq[String]): DataFrame = {
    val t = col(primary)
    val tDim = element_at(t("shape"), 1)
    var df = df0
      .withColumn("total_nr_frames", tDim.cast("int"))
      .withColumn("_f", explode(sequence(lit(0), tDim - 1)))
      .withColumn("frame_nr", col("_f").cast("int"))
    keys.foreach { k =>
      val kt = col(k)
      val fs = element_at(kt("shape"), 2) * element_at(kt("shape"), 3) *
        element_at(kt("shape"), 4) * element_at(kt("shape"), 5)
      df = df.withColumn(k, Tensors.tensor(
        concat(array(lit(1)), slice(kt("shape"), 2, 4)),
        slice(kt("data"), col("_f") * fs + 1, fs)))
    }
    df.drop("_f")
  }

  /** The *serve* plan (`build_transform`, `compose.py:26-234`): optional
    * multi-view copies → seeded random affine resample → normalization
    * (current or saved stats) → photometric augments → clamp → one-hot.
    * `keyCol` drives every seeded draw (RandChangeSeedd T11 is obsolete
    * under keyed hashing — SURVEY §2.9).
    */
  def servePlan(config: GraftConfig, imageCols: Seq[String], labelCols: Seq[String],
                keyCol: String, augmented: Boolean): DataFrame => DataFrame = { df0 =>
    var df = df0
    val key = col(keyCol)
    val (oh, ow) = config.targetSize

    if (augmented && config.copies > 0) {
      df = Tensors.copySamples(df, config.copies)
      df = df.withColumn("_aug_key", concat_ws("#", key, col("copy_nr")))
    } else df = df.withColumn("_aug_key", key)

    // T4 RandResample2Dd: seeded affine, bilinear for images / nearest for labels
    val a = config.augment
    val m =
      if (augmented && a.enabled)
        AffineParams.randomAffine(col("_aug_key"), config.seed,
          a.maxRotationDeg, a.rotationProb, a.scaleRange, a.scaleProb,
          a.flipProb, a.maxShift, a.shiftProb)
      else typedLit(Seq(1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
    df = df.withColumn("_affine", m)
    imageCols.foreach { c =>
      df = df.withColumn(c, warped(c, lit(oh), lit(ow), bilinear = true))
    }
    labelCols.foreach { c =>
      df = df.withColumn(c, warped(c, lit(oh), lit(ow), bilinear = false))
    }

    // T7 normalization family, reference_level current|saved — kernel path:
    // serve records are whole 2-D/3-D buffers where interpreted HOFs drag
    // (see Kernels.bufferStats scaladoc)
    def kernelStandardize(c: String, mean: org.apache.spark.sql.Column,
                          std: org.apache.spark.sql.Column) =
      Tensors.tensor(col(s"$c.shape"),
        when(std > 0,
          Kernels.shiftScale(col(s"$c.data"), -mean, lit(1.0) / std))
          .otherwise(Kernels.shiftScale(col(s"$c.data"), -mean, lit(0.0))))
    imageCols.foreach { c =>
      config.normalize.mode match {
        case "standardize" =>
          df =
            if (config.normalize.referenceLevel == "saved")
              df.withColumn(c, kernelStandardize(c,
                col(s"${c}_meta.mean"), col(s"${c}_meta.std")))
            else {
              val st = Kernels.bufferStats(col(s"$c.data"))
              df.withColumn("_st", st)
                .withColumn(c, kernelStandardize(c, col("_st._3"), col("_st._4")))
                .drop("_st")
            }
        case "normalize" =>
          df = df.withColumn(c, Tensors.normalize(col(c), 0.0, 1.0))
        case _ => ()
      }
    }

    if (augmented) {
      imageCols.foreach { c =>
        if (a.noiseSigma > 0)
          df = df.withColumn(c, Tensors.gaussianNoise(col(c), a.noiseSigma, col("_aug_key"), config.seed + 1))
        if (a.solarizeProb > 0)
          df = df.withColumn(c, Tensors.solarize(col(c), a.solarizeThreshold, a.solarizeProb, col("_aug_key"), config.seed + 2))
        if (a.blurSigma > 0)
          df = df.withColumn(c, repack(Kernels.gaussianBlur(col(s"$c.shape"), col(s"$c.data"), lit(a.blurSigma))))
      }
    }

    config.normalize.clamp.foreach { case (lo, hi) =>
      imageCols.foreach(c => df = df.withColumn(c, Tensors.clamp(col(c), lo, hi)))
    }

    if (config.oneHot)
      labelCols.foreach(c => df = df.withColumn(c, Tensors.oneHot(col(c), config.nrClasses)))

    df.drop("_aug_key")
  }

  /** T5 inverse pipeline (`resampler.py:147-212`, `data_predictor.py`):
    * re-warp a prediction back through the inverse of the recorded affine
    * to the original geometry. */
  def inversePlan(imageCols: Seq[String], sourceH: Int, sourceW: Int): DataFrame => DataFrame = { df0 =>
    var df = df0.withColumn("_inv", Kernels.invertAffine(col("_affine")))
    imageCols.foreach { c =>
      df = df.withColumn(c, repack(
        Kernels.affineResample(col(s"$c.shape"), col(s"$c.data"), col("_inv"),
          lit(sourceH), lit(sourceW), lit(true))))
    }
    df.drop("_inv")
  }

  private def warped(c: String, oh: org.apache.spark.sql.Column,
                     ow: org.apache.spark.sql.Column, bilinear: Boolean) =
    repack(Kernels.affineResample(col(s"$c.shape"), col(s"$c.data"),
      col("_affine"), oh, ow, lit(bilinear)))

  /** kernel UDFs return (shape, data) tuples; repack as the tensor struct. */
  private def repack(c: org.apache.spark.sql.Column) =
    struct(c("_1").as("shape"), c("_2").as("data"))
}
