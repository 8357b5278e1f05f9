package graft.multimodal

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Perceptual VIDEO fingerprint — the composition the image (q70/Phash)
  * and audio (q71/AudioHash) dedup families were built for: demux the
  * container ([[Avi]], MJPEG-in-AVI — the one genuinely JVM-decodable
  * format), sample `take` evenly-spaced frames with the same `n/take`
  * stride rule as `Multimodal.decodeVideo`, and per-frame compute the
  * integer fixed-point DCT pHash ([[Phash]]) on box-filtered 32×32 luma.
  *
  * The per-video signature is the SLOT-ALIGNED frame-hash vector: frame
  * slot i of video A compares against slot i of video B, so two videos
  * are near-dups when the summed per-slot hamming distance is small.
  * Candidate pairing never goes all-pairs: each slot's hash goes through
  * the q44/q70 band machinery ((slot, band-k, 16-bit band) bucket join),
  * so re-encoded/noised copies collide in some band of some slot while
  * unrelated videos share none — Σ(bucket²) pair work, 100 TB posture.
  *
  * Luma is integer ITU-R BT.601 ((77R + 150G + 29B) >> 8 — the same
  * fixed-point weights as JPEG's YCbCr in 8-bit arithmetic), so the whole
  * chain stays FP-free and bit-reproducible across platforms.
  */
object VideoHash {

  /** integer BT.601 luma of a decoded frame, row-major. */
  def intLuma(img: java.awt.image.BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < out.length) {
      val p = rgb(i)
      out(i) = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
      i += 1
    }
    out
  }

  /** AVI bytes → per-sampled-frame pHashes (slot order). `take` caps at
    * the frame count; stride = n/take, matching Multimodal.decodeVideo. */
  def frameHashes(content: Array[Byte], take: Int): Array[Long] = {
    val v = Avi.demux(content)
    val n = v.frames.length
    val t = math.max(1, math.min(take, n))
    val step = math.max(1, n / t)
    Array.tabulate(t) { fi =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(v.frames(fi * step)))
      require(img != null, s"frame ${fi * step} is not a decodable JPEG")
      Phash.hash(Phash.downscale(intLuma(img), img.getWidth, img.getHeight))
    }
  }

  /** summed slot-aligned hamming distance between two signatures (shorter
    * video's missing slots count as maximally distant — 63, the pHash's
    * actual per-slot maximum: the hash is 63-bit, so counting 64 would
    * score a missing slot as more distant than any real frame can be). */
  def distance(a: Array[Long], b: Array[Long]): Int = {
    val n = math.max(a.length, b.length)
    var d = 0; var i = 0
    while (i < n) {
      d += (if (i < a.length && i < b.length) Phash.hamming(a(i), b(i)) else 63)
      i += 1
    }
    d
  }

  /** column form: video binary → array of per-slot pHashes. */
  val hashVideo: UserDefinedFunction =
    udf((content: Array[Byte], take: Int) => frameHashes(content, take))
}
