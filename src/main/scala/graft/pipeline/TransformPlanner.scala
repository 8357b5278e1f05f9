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
    *
    * `recordKeyCols` identifies one source record (e.g. dataset + subject)
    * and is REQUIRED for `special_mode`: ED/ES are *detected* per record
    * (argmax/argmin of foreground volume, `setup/reformat/utils.py:91-113`)
    * and frames renumbered ED-relative (W3, `dataset_cacher.py:357-358`)
    * before the filter — frame 0 after renumber IS the detected ED, like
    * the reference; a raw `frame_nr == 0` filter would pick an arbitrary
    * acquisition frame. */
  def cachePlan(config: GraftConfig, imageCols: Seq[String], labelCols: Seq[String],
                recordKeyCols: Seq[String] = Seq.empty): DataFrame => DataFrame = { df0 =>
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
    // special_mode (`dataset_cacher.py:346-353`): detect ED/ES per record,
    // renumber ED-relative (W3), then keep only the requested frame
    config.specialMode match {
      case Some(mode) =>
        require(labelCols.nonEmpty, "special_mode needs a label column for ED/ES detection")
        require(recordKeyCols.nonEmpty,
          "special_mode needs recordKeyCols to detect ED/ES per record")
        val keyCols = recordKeyCols.map(col)
        // foreground volume per (record, frame): per-row label sum, then
        // frame totals — a hash-agg, no window over the pixel stream
        val vol = aggregate(col(s"${labelCols.head}.data"), lit(0L),
          (acc, x) => acc + when(x > 0, 1L).otherwise(0L))
        val withVol = df.withColumn("_slice_vol", vol)
        val frameVol = withVol.groupBy(keyCols :+ col("frame_nr"): _*)
          .agg(sum(col("_slice_vol")).as("_gt_volume"))
        // argmax (ED) / argmin (ES) among *annotated* frames only — the
        // reference first takes `idx = np.nonzero(sum(cine_gt))` and picks
        // extremes within that set (`setup/reformat/utils.py:101-113`).
        // Without the filter, realistic cine data (labels only on ED/ES)
        // would make ES the first zero-label frame. Smallest-frame tiebreak
        // via lexicographic struct extremes — no row_number. Records with
        // no annotated frame drop out at the join (the reference raises).
        val edes = frameVol.filter(col("_gt_volume") > 0).groupBy(keyCols: _*)
          .agg(max(struct(col("_gt_volume"), (-col("frame_nr")).as("_nf"))).as("_ed"),
            min(struct(col("_gt_volume"), col("frame_nr"))).as("_es"))
          .select(keyCols :+ (-col("_ed._nf")).as("_ed_frame")
            :+ col("_es.frame_nr").as("_es_frame"): _*)
        val renum = withVol.drop("_slice_vol").join(edes, recordKeyCols)
          .withColumn("frame_nr",
            pmod(col("frame_nr") - col("_ed_frame"), col("total_nr_frames")).cast("int"))
          .withColumn("_es_rel",
            pmod(col("_es_frame") - col("_ed_frame"), col("total_nr_frames")).cast("int"))
        val filtered = mode match {
          case "ed_only" => renum.filter(col("frame_nr") === 0)
          case "es_only" => renum.filter(col("frame_nr") === col("_es_rel"))
          case other => throw new IllegalArgumentException(s"unknown special_mode: $other")
        }
        filtered.drop("_ed_frame", "_es_frame", "_es_rel")
      case None => df
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
    * under keyed hashing — SURVEY §2.9). `epoch` is folded into the
    * augmentation key so draws re-randomize each epoch (the reference's
    * MONAI transforms re-draw per epoch; a key without the epoch would
    * serve bit-identical augmentations every epoch) while staying
    * deterministic per (record, copy, epoch).
    */
  def servePlan(config: GraftConfig, imageCols: Seq[String], labelCols: Seq[String],
                keyCol: String, augmented: Boolean,
                epoch: Long = 0L): DataFrame => DataFrame = { df0 =>
    var df = df0
    val key = col(keyCol)
    val (oh, ow) = config.targetSize

    if (augmented && config.copies > 0) {
      df = Tensors.copySamples(df, config.copies)
      df = df.withColumn("_aug_key", concat_ws("#", key, col("copy_nr"), lit(epoch)))
    } else if (augmented) {
      df = df.withColumn("_aug_key", concat_ws("#", key, lit(epoch)))
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
