package graft

import graft.multimodal.{Avi, Phash, VideoHash}
import org.apache.spark.sql.functions._

class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  /** deterministic grayscale frame: smooth gradient + per-frame phase so
    * JPEG survives it (noise-like frames don't JPEG-round-trip stably). */
  private def frame(base: Int, f: Int, w: Int = 64, h: Int = 48,
                    noise: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = 128 + (127 * math.sin((x + base * 13) * 0.09) *
        math.cos((y + f * 17) * 0.11)).toInt
      val v = math.max(0, math.min(255, v0 + (if ((x * 31 + y * 7 + f) % 16 == 0) noise else 0)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def avi(base: Int, noise: Int = 0): Array[Byte] =
    Avi.mux(64, 48, 8, (0 until 16).map(f => jpeg(frame(base, f, noise = noise))))

  test("frameHashes: sampled slots, stride rule, deterministic") {
    val hs = VideoHash.frameHashes(avi(1), 4)
    assert(hs.length == 4)
    assert(hs.toSeq == VideoHash.frameHashes(avi(1), 4).toSeq)
    // take > frame count caps at frame count
    assert(VideoHash.frameHashes(avi(1), 99).length == 16)
  }

  test("noised re-encode is near, different video is far") {
    val a = VideoHash.frameHashes(avi(7), 4)
    val b = VideoHash.frameHashes(avi(7, noise = 24), 4) // same content + sparse noise
    val c = VideoHash.frameHashes(avi(8), 4)              // different content
    assert(VideoHash.distance(a, b) <= 40,
      s"noise variant distance ${VideoHash.distance(a, b)}")
    assert(VideoHash.distance(a, c) > 60,
      s"unrelated distance ${VideoHash.distance(a, c)}")
  }

  test("distance: length mismatch counts missing slots as maximal") {
    val a = VideoHash.frameHashes(avi(3), 4)
    assert(VideoHash.distance(a, a.take(2)) ==
      VideoHash.distance(a.take(2), a.take(2)) + 2 * 63)
  }

  test("hashVideo column form matches the kernel, and the declared q75 chain " +
    "produces one signature per (vid, slot)") {
    val df = Seq((1L, avi(1)), (2L, avi(2))).toDF("vid", "content")
      .select(col("vid"), VideoHash.hashVideo(col("content"), lit(4)).as("sig"))
    val got = df.as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == VideoHash.frameHashes(avi(1), 4).toSeq)
    assert(got(2L) == VideoHash.frameHashes(avi(2), 4).toSeq)
    // declared-corpus chain shape: 200 videos × 4 slots, one hash each
    val ph = graft.queries.VideoQueries.framePhashes(spark)
    assert(ph.count() == 200L * 4)
    assert(ph.select("vid", "slot").distinct().count() == 200L * 4)
  }

  test("q75 JVM phash kernel is bit-identical to the expression twin") {
    // the declared corpus at reduced size: 8 videos (4 near-dup pairs,
    // both even/odd noise branches) — exact integer arithmetic means the
    // equality is order-independent, so 8 videos pin all 200
    val kernel = graft.queries.VideoQueries.framePhashesKernel(spark, 8)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val expression = graft.queries.VideoQueries.framePhashesExpr(spark, 8)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(kernel.size == 32 && kernel == expression)
  }

  test("q90 scene corpus separates regimes: in-scene near, cross-scene far") {
    val cuts = graft.queries.VideoQueries.q90.build(spark, sf0001)
      .as[(Long, Int, Int, Boolean)].collect()
    assert(cuts.length == 120 * 3)
    val (cross, within) = cuts.partition(_._2 == 2)
    assert(cross.forall(_._4), "every scene boundary must be a cut")
    assert(within.forall(!_._4), "no in-scene boundary may flag")
    assert(within.map(_._3).max <= 10 && cross.map(_._3).min >= 16,
      "the hamming regimes must be separated, not threshold-adjacent")
  }

  test("intLuma matches BT.601 integer weights on primaries") {
    val img = new java.awt.image.BufferedImage(3, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00); img.setRGB(2, 0, 0x0000ff)
    assert(VideoHash.intLuma(img).toSeq ==
      Seq((77 * 255) >> 8, (150 * 255) >> 8, (29 * 255) >> 8))
  }

  test("production and declared corpora use the same hash function") {
    // a 32×32 frame bypasses downscale: hash(intLuma) == Phash.hash directly
    val img = frame(5, 0, w = 32, h = 32)
    val l = VideoHash.intLuma(img)
    assert(Phash.hash(Phash.downscale(l, 32, 32)) == Phash.hash(l))
  }
}
