package graft.pipeline

import graft.tensor.{Kernels, Tensors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable model boundary for the predict stage: anything that adds a
  * `prediction` tensor column (same struct(shape, data) type as the image)
  * to the served frame. Implementations need a no-arg constructor to be
  * loadable by name from config (`scorer: class:<fqcn>`). */
trait Scorer {
  def score(served: DataFrame, imageCol: String): DataFrame
}

/** The predict stage (`pipeline/data_predictor.py:120-414`): run a scoring
  * function over served records, inverse-resample predictions back to
  * original geometry (T5 `BatchInverseTransform` → `resampler.py:194-212`),
  * then summarize. The model itself stays abstract (`forward_model` is the
  * reference's GPU hole — SURVEY §7.5): callers plug any
  * `DataFrame => DataFrame` that adds a `prediction` tensor column.
  */
object Predictor {

  /** Resolve a scorer spec from config — the model plug-point usable
    * without recompiling (`data_predictor.py`'s forward_model boundary):
    *  - `identity`        — prediction := served image (the test stub)
    *  - `expr:<sql>`      — any SQL expression over the served frame that
    *    yields a tensor struct, e.g.
    *    `expr:named_struct('shape', image.shape, 'data', transform(image.data, x -> -x))`
    *  - `class:<fqcn>`    — a [[Scorer]] implementation with a no-arg
    *    constructor, loaded reflectively (a real model runner's entry)
    * Unknown specs fail by name. */
  def resolveScorer(spec: String): (DataFrame, String) => DataFrame = spec match {
    case "identity" =>
      (df, imageCol) => df.withColumn("prediction", col(imageCol))
    case s if s.startsWith("expr:") =>
      val e = s.stripPrefix("expr:")
      (df, _) => df.withColumn("prediction", expr(e))
    case s if s.startsWith("class:") =>
      val inst = Class.forName(s.stripPrefix("class:"))
        .getDeclaredConstructor().newInstance().asInstanceOf[Scorer]
      (df, imageCol) => inst.score(df, imageCol)
    case other => throw new IllegalArgumentException(
      s"unknown scorer spec '$other' — expected identity | expr:<sql> | class:<fqcn>")
  }

  /** Inverse-warp the `prediction` column through the recorded `_affine`
    * back to (sourceH, sourceW) — the invertible-transform contract:
    * metadata column + paired inverse kernel (SURVEY §2.9 T5). */
  def invertPredictions(scored: DataFrame, sourceH: Int, sourceW: Int): DataFrame =
    TransformPlanner.inversePlan(Seq("prediction"), sourceH, sourceW)(scored)

  /** softmax over the channel axis of a (T,D,C,H,W) prediction
    * (`data_predictor.py:388-391`, F13) — HOF math over the flat buffer:
    * for each (t,d,·,y,x) fiber, exp/Σexp across C. */
  def softmaxChannels(df: DataFrame, predCol: String): DataFrame = {
    val t = col(predCol)
    val c = element_at(t("shape"), 3)
    val hw = element_at(t("shape"), 4) * element_at(t("shape"), 5)
    val blocks = element_at(t("shape"), 1) * element_at(t("shape"), 2)
    val data = flatten(transform(sequence(lit(0), blocks - 1), b =>
      flatten(transform(sequence(lit(0), c - 1), ch =>
        transform(sequence(lit(0), hw - 1), i => {
          val fiber = transform(sequence(lit(0), c - 1), cc =>
            exp(element_at(t("data"), ((b * c + cc) * hw + i + 1).cast("int")).cast("double")))
          val z = aggregate(fiber, lit(0.0), (acc, x) => acc + x)
          (exp(element_at(t("data"), ((b * c + ch) * hw + i + 1).cast("int")).cast("double")) / z)
            .cast("float")
        })))))
    df.withColumn(predCol, Tensors.tensor(t("shape"), data))
  }

  /** argmax over channels → discrete label map (prediction summary step). */
  def argmaxChannels(df: DataFrame, predCol: String): DataFrame = {
    val t = col(predCol)
    val c = element_at(t("shape"), 3)
    val hw = element_at(t("shape"), 4) * element_at(t("shape"), 5)
    val blocks = element_at(t("shape"), 1) * element_at(t("shape"), 2)
    val data = flatten(transform(sequence(lit(0), blocks - 1), b =>
      transform(sequence(lit(0), hw - 1), i => {
        val best = aggregate(sequence(lit(0), c - 1),
          struct(lit(0).as("arg"), lit(Float.MinValue).cast("float").as("v")),
          (acc, cc) => {
            val v = element_at(t("data"), ((b * c + cc) * hw + i + 1).cast("int"))
            when(v > acc("v"), struct(cc.cast("int").as("arg"), v.as("v"))).otherwise(acc)
          })
        best("arg").cast("float")
      })))
    df.withColumn(predCol, Tensors.tensor(
      concat(slice(t("shape"), 1, 2), array(lit(1)), slice(t("shape"), 4, 2)), data))
  }

  /** Per-class pixel counts of a label map — the summary aggregation the
    * reference computes per subject (`data_predictor.py:250-290` shape). */
  def classCounts(df: DataFrame, labelCol: String, nrClasses: Int): DataFrame = {
    val counts = (0 until nrClasses).map { cls =>
      aggregate(col(s"$labelCol.data"), lit(0L),
        (acc, x) => acc + when(round(x, 0).cast("int") === cls, 1L).otherwise(0L))
        .as(s"class_$cls")
    }
    df.select(col("*") +: counts: _*)
  }
}
