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
