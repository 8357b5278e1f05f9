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
  * javax.imageio — `decodeImage`, BT.601 luma → (1,1,1,H,W)). Audio and
  * video decode remain deterministic STUBS (no such codecs ship in the
  * JVM): pixels derived from a rolling hash of the bytes, so the
  * Spark-side plumbing (schema, partitioning, batch shape, downstream
  * tensor ops) is real and tested end-to-end. Swap `fakeDecode*` for a
  * real codec UDF (or `mapInPandas`+PIL on PySpark) without touching any
  * caller.
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
      val h = img.getHeight; val w = img.getWidth
      val data = new Array[Float](h * w)
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
      (Seq(1, 1, 1, h, w), data.toSeq)
    })

  /** STUB image decode for synthetic payloads (see header). */
  val fakeDecodeImage: UserDefinedFunction =
    udf((content: Array[Byte], h: Int, w: Int) => {
      val data = new Array[Float](h * w)
      var i = 0
      while (i < data.length) { data(i) = pix(content, i); i += 1 }
      (Seq(1, 1, 1, h, w), data.toSeq)
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
      (Seq(take, 1, 1, h, w), data.toSeq, frames)
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
