package graft.tools

import org.apache.spark.sql.functions._

/** Production-path unit costs for the round-8 fingerprint/segmentation
  * operators — the declared q68/q70/q71 corpora are fixture-sized by
  * oracle contract, so the numbers that matter at 100 TB are the per-item
  * kernel costs and the per-word segmentation rate on a REALISTIC
  * vocabulary (the synthetic corpus's 30-word vocab makes q68's
  * distinct-word side trivially small; real corpora carry millions).
  *
  *   - Phash.hash: integer DCT on a 32×32 luma grid (per decoded image)
  *   - AudioHash.hash: envelope hash on a 2304-sample clip
  *   - Subword.countCol: greedy segmentation of N DISTINCT synthetic
  *     words through the Spark HOF fold (the corpus-side join cost is
  *     q68's, measured separately in its scale rows)
  *
  * Usage: runMain graft.tools.FingerprintBench [nWords]
  */
object FingerprintBench {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toLong).getOrElse(1000000L)
    val rng = new scala.util.Random(7)

    def timeIt(n: Long)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      n / ((System.nanoTime() - t0) / 1e9)
    }

    // JVM kernel rates (single core — a scan parallelizes linearly)
    val grids = Array.fill(64)(Array.fill(1024)(rng.nextInt(256)))
    val imgWarm = grids.map(graft.multimodal.Phash.hash).sum // JIT warmup
    val imgRate = timeIt(2000) {
      var i = 0
      var acc = 0L
      while (i < 2000) { acc ^= graft.multimodal.Phash.hash(grids(i % 64)); i += 1 }
      require(acc != imgWarm + 1) // keep the loop un-eliminable
    }
    // video fingerprint: end-to-end per-video cost (AVI demux + 4-frame
    // JPEG decode + downscale + pHash) on a realistic 64×48 16-frame clip
    val vidBytes = {
      val frames = (0 until 16).map { f =>
        val img = new java.awt.image.BufferedImage(64, 48,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64 * 48) {
          val v = (f * 131 + i * 7) % 256
          img.setRGB(i % 64, i / 64, (v << 16) | (v << 8) | v); i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      graft.multimodal.Avi.mux(64, 48, 8, frames)
    }
    val vidWarm = graft.multimodal.VideoHash.frameHashes(vidBytes, 4).sum
    val vidRate = timeIt(200) {
      var i = 0
      var acc = 0L
      while (i < 200) { acc ^= graft.multimodal.VideoHash.frameHashes(vidBytes, 4)(i % 4); i += 1 }
      require(acc != vidWarm + 1)
    }
    val clips = Array.fill(64)(Array.fill(2304)(rng.nextInt(256) - 128))
    val auWarm = clips.map(graft.multimodal.AudioHash.hash).sum
    val auRate = timeIt(20000) {
      var i = 0
      var acc = 0L
      while (i < 20000) { acc ^= graft.multimodal.AudioHash.hash(clips(i % 64)); i += 1 }
      require(acc != auWarm + 1)
    }

    // Spark-side distinct-word segmentation rate at realistic vocab size
    val spark = graft.Session.local(appName = "graft-fingerprint-bench")
    spark.sparkContext.setLogLevel("WARN")
    val words = spark.range(nWords).select(
      concat_ws("", (0 until 8).map(i =>
        substring(md5(concat_ws(":", col("id").cast("string"), lit(i))), 1, 2)): _*)
        .substr(lit(1), (pmod(col("id"), lit(14)) + 3).cast("int")).as("word"))
    words.count() // materialize the input cost outside the timed region? no — same scan both
    val segRate = timeIt(nWords) {
      words.select(graft.operators.Subword.countCol(col("word")).as("n"))
        .agg(sum("n")).head()
    }
    println(f"""{"metric":"fingerprint_kernels","phash_per_sec":$imgRate%.0f,"audiohash_per_sec":$auRate%.0f,"videohash_per_sec":$vidRate%.0f,"subword_words_per_sec":$segRate%.0f,"n_words":$nWords%d}""")
    spark.stop()
  }
}
