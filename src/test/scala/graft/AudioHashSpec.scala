package graft

import graft.multimodal.AudioHash

class AudioHashSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** the q71 corpus's PCM, built by the pure-Scala reference (same md5
    * sample construction as the declared query's two engines). */
  private def pcm(clipId: Long): Array[Int] = {
    val base = clipId / 2
    Array.tabulate(2304) { j =>
      val h = md5hex(s"$base:$j:au")
      val v = Integer.parseInt(h.substring(0, 2), 16) - 128
      val noise = if (clipId % 2 == 1 && md5hex(s"$base:$j:an").charAt(0) == '0') 1 else 0
      v + noise
    }
  }

  test("envelope hash: noise variants are near, unrelated clips are far") {
    val h0 = AudioHash.hash(pcm(0)); val h1 = AudioHash.hash(pcm(1))
    val h2 = AudioHash.hash(pcm(2)); val h3 = AudioHash.hash(pcm(3))
    assert(AudioHash.hamming(h0, h1) <= 10, s"pair hamming ${AudioHash.hamming(h0, h1)}")
    assert(AudioHash.hamming(h2, h3) <= 10)
    assert(AudioHash.hamming(h0, h2) > 10)
  }

  test("declared-query ahash chain matches the pure-Scala reference") {
    val got = graft.queries.AudioQueries.ahashes(spark)
      .filter(org.apache.spark.sql.functions.col("clip_id") < 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 4L).foreach { id =>
      assert(got(id) == AudioHash.hash(pcm(id)), s"clip $id")
    }
  }

  test("q71 JVM ahash kernel is bit-identical to the expression twin") {
    // 8 clips (4 near-dup pairs, both noise branches) pin all 200 —
    // exact integer arithmetic makes the equality order-independent
    val kernel = graft.queries.AudioQueries.ahashesKernel(spark, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val expression = graft.queries.AudioQueries.ahashesExpr(spark, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(kernel.size == 8 && kernel == expression)
  }

  test("hash is invariant under 16-bit PCM WAV encode→decode round-trip") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = pcm(0)
    // 8-bit-magnitude ints scaled to 16-bit full range: <<8 is exact in
    // float32 through decodeAudio's /32768 normalization, so the decoded
    // floats recover the original ints bit-exactly
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = s << 8
      bytes(2 * i) = (v & 0xff).toByte; bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq((1L, bos.toByteArray))).toDF("media_id", "content")
    val dec = graft.multimodal.Multimodal.decodeAudio(col("content"))
    val floats = df.select(dec("_2").as("data")).head().getSeq[Float](0)
    val back = floats.map(f => Math.round(f * 32768f) >> 8).toArray
    assert(back.toSeq == samples.toSeq, "16-bit WAV round-trip must be exact")
    assert(AudioHash.hash(back) == AudioHash.hash(samples))
  }

  test("hash handles arbitrary lengths via equal-range cells") {
    // constant signal → no cell beats its neighbor → hash 0
    assert(AudioHash.hash(Array.fill(720)(5)) == 0L)
    // a single loud cell at the start of each window flips only that
    // window's first comparison
    val n = 72 * 10
    val loud = Array.tabulate(n)(i => if ((i / 10) % 8 == 0) 100 else 1)
    val h = AudioHash.hash(loud)
    assert(java.lang.Long.bitCount(h) == 9, s"expected 9 bits, got ${java.lang.Long.bitCount(h)}")
    assertThrows[IllegalArgumentException](AudioHash.hash(Array.fill(10)(1)))
  }
}
