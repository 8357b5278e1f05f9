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
    // gray ramp 0..3 normalizes to 0,85,170,255; decode reads raw raster
    // samples, so MID grays round-trip exactly — getRGB's gray→sRGB
    // conversion would return 156 for stored 85 (endpoints are invariant
    // under that conversion and would mask the distortion)
    val lums = r(0).getSeq[Float](3)
    assert(lums == Seq(0f, 85f, 170f, 255f))
    val rev = r(1).getSeq[Float](3)
    assert(math.abs(rev(0) - 255f) < 0.5f && math.abs(rev(3) - 0f) < 0.5f)
    // end-to-end real pipeline: decode → resize → features
    val piped = Multimodal.imagePipeline(df, "content", 2, 2, 2, 2, real = true)
    assert(piped.select(col("features.pooled16")).head().getSeq[Float](0).length == 16)
  }

  test("real audio decode: 16-bit PCM WAV round-trips samples, rate, channels") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // stereo 16-bit LE PCM: L = [0, 16384, -16384, 32767], R = [100, -100, 200, -200]
    val left = Array[Short](0, 16384, -16384, 32767)
    val right = Array[Short](100, -100, 200, -200)
    val pcm = new Array[Byte](left.length * 4)
    for (i <- left.indices; (s, c) <- Seq((left(i), 0), (right(i), 1))) {
      val off = (i * 2 + c) * 2
      pcm(off) = (s & 0xff).toByte; pcm(off + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, left.length), AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(Seq((1L, bos.toByteArray))).toDF("media_id", "content")
    val dec = Multimodal.decodeAudio(col("content"))
    val r = df.select(dec("_1").as("shape"), dec("_2").as("data"),
      dec("_3").as("rate"), dec("_4").as("n")).head()
    assert(r.getSeq[Int](0) == Seq(1, 1, 2, 1, 4))
    assert(r.getInt(2) == 8000 && r.getInt(3) == 4)
    val data = r.getSeq[Float](1)
    // channel-major planes, full-scale = 32768
    assert(data.take(4) == left.toSeq.map(_ / 32768f))
    assert(data.drop(4) == right.toSeq.map(_ / 32768f))
    // non-PCM payloads fail loudly
    assertThrows[org.apache.spark.SparkException] {
      df.select(Multimodal.decodeAudio(lit("not audio".getBytes))("_3")).head()
    }
  }

  test("audio decode: u-law WAV converts to PCM inside the JDK") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // encode a known PCM ramp to u-law via the JDK, then decode through
    // the UDF and check the round-trip within u-law quantization error
    val pcm16 = Array[Short](0, 8000, -8000, 24000, -24000, 32000)
    val pcmBytes = new Array[Byte](pcm16.length * 2)
    for (i <- pcm16.indices) {
      pcmBytes(2 * i) = (pcm16(i) & 0xff).toByte
      pcmBytes(2 * i + 1) = ((pcm16(i) >> 8) & 0xff).toByte
    }
    val pcmFmt = new AudioFormat(8000f, 16, 1, true, false)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ulawStream = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(pcmBytes), pcmFmt, pcm16.length))
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawStream, AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(Seq((1L, bos.toByteArray))).toDF("media_id", "content")
    val dec = Multimodal.decodeAudio(col("content"))
    val r = df.select(dec("_1").as("shape"), dec("_2").as("data"), dec("_3").as("rate")).head()
    assert(r.getSeq[Int](0) == Seq(1, 1, 1, 1, 6))
    assert(r.getInt(2) == 8000)
    val got = r.getSeq[Float](1)
    for (i <- pcm16.indices) {
      val want = pcm16(i) / 32768f
      assert(math.abs(got(i) - want) < 0.04f, // u-law SNR bound at these levels
        s"sample $i: got ${got(i)}, want ~$want")
    }
  }

  test("real video decode: MJPEG-in-AVI round-trips geometry, fps, sampled frames") {
    import graft.multimodal.Avi
    // 12 solid-gray 16x16 frames, level = 20*i — JPEG is near-exact on
    // constant blocks, so sampled means identify which frame was decoded
    val jpegs = (0 until 12).map { i =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.getRaster
      for (y <- 0 until 16; x <- 0 until 16) g.setSample(x, y, 0, 20 * i)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val avi = Avi.mux(16, 16, fps = 10, jpegs)
    // demux twin: container fields survive the round-trip
    val v = Avi.demux(avi)
    assert(v.width == 16 && v.height == 16 && v.fps == 10.0 && v.frames.length == 12)
    assert(v.frames.zip(jpegs).forall { case (a, b) => a.sameElements(b) })
    // the Spark path: decode 4 evenly-spaced frames
    val df = spark.createDataFrame(Seq((1L, avi))).toDF("media_id", "content")
    val dec = Multimodal.decodeVideo(col("content"), lit(4))
    val r = df.select(dec("_1").as("shape"), dec("_2").as("data"),
      dec("_3").as("frames"), dec("_4").as("fps")).head()
    assert(r.getSeq[Int](0) == Seq(4, 1, 1, 16, 16))
    assert(r.getSeq[Int](2) == Seq(0, 3, 6, 9))
    assert(r.getDouble(3) == 10.0)
    val data = r.getSeq[Float](1)
    assert(data.length == 4 * 256)
    for (fi <- 0 until 4) {
      val mean = data.slice(fi * 256, (fi + 1) * 256).sum / 256f
      assert(math.abs(mean - 20f * (fi * 3)) < 2f,
        s"sampled frame $fi mean $mean, expected ${20 * fi * 3}")
    }
    // non-AVI payloads fail loudly
    assertThrows[org.apache.spark.SparkException] {
      df.select(Multimodal.decodeVideo(lit("not a video".getBytes), lit(2))("_1")).head()
    }
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
