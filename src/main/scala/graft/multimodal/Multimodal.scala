package graft.multimodal

import graft.tensor.Tensors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (training-pipeline brief): image/audio/video travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as column UDFs over the
  * binary payload.
  *
  * IMAGE decode is REAL for the JDK's raster formats (PNG/JPEG/BMP/GIF via
  * javax.imageio — `decodeImage`, BT.601 luma → (1,1,1,H,W); grayscale
  * reads raw raster samples, no sRGB gamma). AUDIO decode is REAL for
  * WAV/PCM (`decodeAudio`, javax.sound.sampled → (1,1,C,1,N) + sample_rate
  * /n_frames meta); non-PCM encodings fail loudly (external-transcode
  * posture). VIDEO decode is REAL for MJPEG-in-AVI (`decodeVideo`, the
  * [[Avi]] demuxer + per-frame ImageIO JPEG decode → evenly-sampled
  * (T,1,1,H,W) frames); other containers/codecs (H.264, VP9, …) have no
  * JVM codec and fail loudly, same posture as non-PCM audio and
  * JPEG-2000 DICOM. `fakeSampleFrames` remains for synthetic payloads
  * where only the Spark-side plumbing is under test.
  *
  * Scale notes: binary payloads stay columnar in Parquet; decode is
  * embarrassingly parallel per record; `spark.sql.files.maxPartitionBytes`
  * bounds per-task memory (SURVEY §7.4.3 applies to the decoded buffers
  * too).
  */
object Multimodal {

  /** Canonical media-record schema: id, modality, binary payload, typed meta. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** deterministic pseudo-pixel from (bytes, index): a cheap rolling hash —
    * the ??? stand-in for a real image decode. */
  private def pix(bytes: Array[Byte], i: Int): Float = {
    var h = 1469598103934665603L ^ i
    var j = i % 16
    val n = math.min(bytes.length, 64)
    while (j < n) { h = (h ^ bytes(j)) * 1099511628211L; j += 7 }
    ((h >>> 40) & 0xff).toFloat
  }

  /** REAL image decode (pure JDK): PNG/JPEG/BMP/GIF binary →
    * (1,1,1,H,W) float tensor of BT.601 luma values. Fails loudly on
    * undecodable payloads — use [[fakeDecodeImage]] for synthetic bytes. */
  val decodeImage: UserDefinedFunction =
    udf((content: Array[Byte]) => {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, "payload is not a decodable raster image")
      val data = luma(img)
      (Seq(1, 1, 1, img.getHeight, img.getWidth), data)
    })

  /** BT.601 luma plane of a decoded image; grayscale reads raw raster
    * samples — getRGB would run the stored linear-gray values through a
    * gray→sRGB conversion (85 → 156 on this JDK), gamma-distorting the
    * luma vs what PIL returns. */
  private def luma(img: java.awt.image.BufferedImage): Array[Float] = {
    val h = img.getHeight; val w = img.getWidth
    val data = new Array[Float](h * w)
    if (img.getRaster.getNumBands == 1) {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { data(y * w + x) = raster.getSample(x, y, 0).toFloat; x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          data(y * w + x) = 0.299f * r + 0.587f * g + 0.114f * b
          x += 1
        }
        y += 1
      }
    }
    data
  }

  /** REAL audio decode (pure JDK, `javax.sound.sampled`): WAV/PCM binary →
    * ((1,1,C,1,N) float tensor, sample_rate, n_frames). Samples normalized
    * to [-1, 1] by the format's full-scale value; channels interleave →
    * channel-major planes. Fails loudly on non-PCM encodings (MP3/OGG have
    * no JDK codec — external-transcode posture, like compressed DICOM). */
  val decodeAudio: UserDefinedFunction =
    udf((content: Array[Byte]) => {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw0 = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      // μ-law/A-law (telephony WAVs) convert to 16-bit PCM inside the JDK
      val in =
        if (raw0.getFormat.getEncoding == AudioFormat.Encoding.ULAW ||
          raw0.getFormat.getEncoding == AudioFormat.Encoding.ALAW) {
          val f = raw0.getFormat
          AudioSystem.getAudioInputStream(new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
            f.getChannels, f.getChannels * 2, f.getSampleRate, false), raw0)
        } else raw0
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        require(enc == AudioFormat.Encoding.PCM_SIGNED || enc == AudioFormat.Encoding.PCM_UNSIGNED,
          s"unsupported audio encoding $enc: only PCM and ULAW/ALAW WAV decode in " +
            "the pure JVM; transcode externally (ffmpeg) first, as with compressed DICOM")
        val ch = fmt.getChannels
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        require(bytesPerSample == 1 || bytesPerSample == 2,
          s"unsupported PCM sample size ${fmt.getSampleSizeInBits} bits (want 8 or 16)")
        // the 16-bit branch below decodes two's-complement; letting a
        // 16-bit UNSIGNED stream through it would silently add a
        // full-scale DC offset, so fail loudly instead (WAV convention is
        // unsigned at 8 bits, signed at 16 — this rejects only malformed
        // or exotic files)
        require(enc == AudioFormat.Encoding.PCM_SIGNED || bytesPerSample == 1,
          "16-bit unsigned PCM is not supported (WAV convention is signed at " +
            "16 bits); transcode externally first")
        val raw = in.readAllBytes()
        val n = raw.length / (bytesPerSample * ch)
        val data = new Array[Float](ch * n)
        var f = 0
        while (f < n) {
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * bytesPerSample
            val v =
              if (bytesPerSample == 1) {
                if (enc == AudioFormat.Encoding.PCM_UNSIGNED) ((raw(off) & 0xff) - 128) / 128f
                else raw(off) / 128f
              } else {
                val b0 = raw(off) & 0xff; val b1 = raw(off + 1) & 0xff
                val s16 =
                  if (fmt.isBigEndian) ((raw(off) << 8) | b1).toShort
                  else ((raw(off + 1) << 8) | b0).toShort
                s16 / 32768f
              }
            data(c * n + f) = v
            c += 1
          }
          f += 1
        }
        (Seq(1, 1, ch, 1, n), data, fmt.getSampleRate.toInt, n)
      } finally in.close()
    })

  /** STUB image decode for synthetic payloads (see header). */
  val fakeDecodeImage: UserDefinedFunction =
    udf((content: Array[Byte], h: Int, w: Int) => {
      val data = new Array[Float](h * w)
      var i = 0
      while (i < data.length) { data(i) = pix(content, i); i += 1 }
      (Seq(1, 1, 1, h, w), data)
    })

  /** REAL video frame-sample (pure JVM): MJPEG-in-AVI binary → `take`
    * evenly-spaced frames decoded to luma as a (take,1,1,H,W) tensor,
    * plus the sampled frame indices and the container frame rate. Uses
    * the same `n/take` stride rule as [[fakeSampleFrames]] so callers
    * can swap stub↔real without changing downstream expectations. Fails
    * loudly on non-AVI containers and non-MJPEG codecs. */
  val decodeVideo: UserDefinedFunction =
    udf((content: Array[Byte], take: Int) => {
      val v = Avi.demux(content)
      val n = v.frames.length
      val t = math.max(1, math.min(take, n))
      val step = math.max(1, n / t)
      val idx = (0 until t).map(_ * step)
      val hw = v.height * v.width
      val data = new Array[Float](t * hw)
      var fi = 0
      while (fi < t) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(v.frames(idx(fi))))
        require(img != null, s"frame ${idx(fi)} is not a decodable JPEG")
        require(img.getHeight == v.height && img.getWidth == v.width,
          s"frame ${idx(fi)} is ${img.getWidth}x${img.getHeight}, header says ${v.width}x${v.height}")
        System.arraycopy(luma(img), 0, data, fi * hw, hw)
        fi += 1
      }
      (Seq(t, 1, 1, v.height, v.width), data, idx, v.fps)
    })

  /** STUB video frame-sample: binary → n evenly-spaced decoded frames as a
    * (n,1,1,H,W) tensor (frame index folded into the hash). */
  val fakeSampleFrames: UserDefinedFunction =
    udf((content: Array[Byte], nFrames: Int, take: Int, h: Int, w: Int) => {
      val step = math.max(1, nFrames / math.max(1, take))
      val frames = (0 until take).map(_ * step)
      val data = new Array[Float](take * h * w)
      var fi = 0
      while (fi < take) {
        var i = 0
        while (i < h * w) {
          data(fi * h * w + i) = pix(content, frames(fi) * 131 + i)
          i += 1
        }
        fi += 1
      }
      (Seq(take, 1, 1, h, w), data, frames)
    })

  /** Average-pool resize (real, not a stub): runs on the decoded tensor via
    * the affine kernel (bilinear scale-to-fit). */
  def resize(t: Column, oh: Int, ow: Int): Column = {
    val h = element_at(t("shape"), 4).cast("double")
    val w = element_at(t("shape"), 5).cast("double")
    val m = array(w / ow, lit(0.0), lit(0.0), lit(0.0), h / oh, lit(0.0))
    val r = graft.tensor.Kernels.affineResample(
      t("shape"), t("data"), m, lit(oh), lit(ow), lit(true))
    struct(r("_1").as("shape"), r("_2").as("data"))
  }

  /** Feature extraction over a decoded media tensor: stats + a coarse 4×4
    * pooled signature — pure HOF column math downstream of the stub. */
  def features(t: Column): Column = {
    val st = Tensors.stats(t("data"))
    struct(st.as("stats"), resize(t, 4, 4)("data").as("pooled16"))
  }

  /** End-to-end demo plan used by tests: documents bytes → "images" →
    * decode → resize → features. `real = true` routes through the JDK
    * imageio decode (content must be an actual raster image). */
  def imagePipeline(df: DataFrame, contentCol: String, h: Int, w: Int,
                    oh: Int, ow: Int, real: Boolean = false): DataFrame = {
    val dec =
      if (real) decodeImage(col(contentCol))
      else fakeDecodeImage(col(contentCol), lit(h), lit(w))
    df.withColumn("img", struct(dec("_1").as("shape"), dec("_2").as("data")))
      .withColumn("img", resize(col("img"), oh, ow))
      .withColumn("features", features(col("img")))
  }
}
