package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary → (stub) decode → resize → features, with
  * deterministic outputs. */
class MultimodalSpec extends SparkSpec {

  private def media = Tables.documents(spark, sf0001)
    .select(col("doc_id").as("media_id"), lit("image").as("modality"),
      col("text").cast("binary").as("content"))

  test("image pipeline: schema, shapes, determinism") {
    val out = Multimodal.imagePipeline(media, "content", h = 8, w = 8, oh = 4, ow = 4)
    assert(out.select(col("img.shape")).head().getSeq[Int](0) == Seq(1, 1, 1, 4, 4))
    val a = out.orderBy("media_id").select(col("features.stats.mean")).collect().map(_.getDouble(0))
    val b = Multimodal.imagePipeline(media, "content", 8, 8, 4, 4)
      .orderBy("media_id").select(col("features.stats.mean")).collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq, "stub decode must be deterministic")
    // different payloads give different features (hash actually varies)
    assert(a.distinct.length > 1)
    val pooled = out.select(col("features.pooled16")).head().getSeq[Float](0)
    assert(pooled.length == 16)
  }

  test("real image decode: PNG bytes → luma tensor through the pipeline") {
    // render real PNGs with the S9 encoder, decode with the JDK path
    val pngs = Seq(
      (1L, graft.sources.Png.grayPng(Array(0f, 1f, 2f, 3f), 2, 2)),
      (2L, graft.sources.Png.grayPng(Array(3f, 2f, 1f, 0f), 2, 2)))
    val df = spark.createDataFrame(pngs).toDF("media_id", "content")
    val dec = Multimodal.decodeImage(col("content"))
    val out = df.select(col("media_id"),
      col("content"), dec("_1").as("shape"), dec("_2").as("data"))
    val r = out.orderBy("media_id").collect()
    assert(r(0).getSeq[Int](2) == Seq(1, 1, 1, 2, 2))
    // gray ramp 0..3 normalizes to 0,85,170,255; luma of gray(v) ≈ v
    val lums = r(0).getSeq[Float](3)
    assert(math.abs(lums(0) - 0f) < 0.5f && math.abs(lums(3) - 255f) < 0.5f)
    val rev = r(1).getSeq[Float](3)
    assert(math.abs(rev(0) - 255f) < 0.5f && math.abs(rev(3) - 0f) < 0.5f)
    // end-to-end real pipeline: decode → resize → features
    val piped = Multimodal.imagePipeline(df, "content", 2, 2, 2, 2, real = true)
    assert(piped.select(col("features.pooled16")).head().getSeq[Float](0).length == 16)
  }

  test("video frame sampling emits requested frame count and indices") {
    val out = media.limit(3).select(col("media_id"),
      Multimodal.fakeSampleFrames(col("content"), lit(30), lit(4), lit(4), lit(4)).as("v"))
      .select(col("media_id"), col("v._1").as("shape"), col("v._2").as("data"), col("v._3").as("frames"))
    val r = out.head()
    assert(r.getSeq[Int](1) == Seq(4, 1, 1, 4, 4))
    assert(r.getSeq[Float](2).length == 4 * 16)
    assert(r.getSeq[Int](3) == Seq(0, 7, 14, 21))
  }
}
