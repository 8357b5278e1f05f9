package graft.sources

import graft.multimodal.Avi
import org.scalatest.funsuite.AnyFunSuite

/** Extend the DICOM hostile-input posture (DicomFuzzSpec) to the OTHER
  * binary parsers: NIfTI-1 (incl. the gzip path) and the RIFF/AVI
  * demuxer. Same contract: random corruption, targeted hostile lengths,
  * and every truncation prefix must terminate promptly — throw loudly or
  * decode garbage, never hang or allocate GB-scale buffers (corrupt
  * dim[] reaches 2^60 voxels; a gzip bomb expands 1000:1). */
class BinaryFuzzSpec extends AnyFunSuite {

  private def attempt(f: => Unit, label: String): Boolean = {
    val t0 = System.nanoTime()
    val threw = try { f; false } catch { case _: Exception => true }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"$label took ${ms}ms — parser stalled or allocated huge")
    threw
  }

  private def niftiFixture(gz: Boolean): Array[Byte] = {
    val rng = new scala.util.Random(613)
    val data = Array.fill(2 * 3 * 5 * 7)(rng.nextFloat() * 100 - 50)
    Nifti.encode(Seq(2, 3, 1, 5, 7), data, Seq(1f, 1f, 2f), gzip = gz)
  }

  test("NIfTI: random corruption and truncation terminate promptly") {
    val rng = new scala.util.Random(617)
    for ((label, good) <- Seq("plain" -> niftiFixture(gz = false),
                              "gz" -> niftiFixture(gz = true))) {
      var threw = 0
      for (_ <- 0 until 200) {
        val b = good.clone()
        for (_ <- 0 to rng.nextInt(4))
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        if (attempt(Nifti.decode(b), label)) threw += 1
      }
      info(s"$label: $threw/200 corruptions threw, rest decoded to garbage; none hung")
      for (cut <- 0 until good.length by 7)
        attempt(Nifti.decode(java.util.Arrays.copyOf(good, cut)), s"$label cut=$cut")
    }
  }

  test("NIfTI: hostile dim[]/datatype/vox_offset fail loudly, no huge alloc") {
    val good = niftiFixture(gz = false)
    // every 2-byte window in the 348-byte header gets hostile shorts —
    // covers dim[1..7] (2^60-voxel products), datatype, and via pairs the
    // float fields (vox_offset, scl) too
    for (hostile <- Seq(0x7fff, 0x4001, -1, -32768); off <- 0 until 348 by 2) {
      val b = good.clone()
      b(off) = (hostile & 0xff).toByte
      b(off + 1) = ((hostile >> 8) & 0xff).toByte
      attempt(Nifti.decode(b), s"nifti@$off=$hostile")
    }
  }

  test("NIfTI: gzip bomb fails loudly at the expansion bound") {
    // ~1.2 GB of zeros deflates to ~1 MB; decode must throw the bomb
    // guard, not buffer toward OOM
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val zeros = new Array[Byte](1 << 20)
    for (_ <- 0 until 1200) gz.write(zeros)
    gz.close()
    val bomb = bos.toByteArray
    info(s"bomb: ${bomb.length} compressed bytes")
    val e = intercept[IllegalArgumentException](Nifti.decode(bomb))
    assert(e.getMessage.contains("decompression bomb"), e.getMessage)
  }

  test("JPEG-LS: random corruption, hostile u16 fields, truncation terminate promptly") {
    val rng = new scala.util.Random(631)
    val samples = Array.fill(24 * 18)(rng.nextInt(1 << 12))
    val good = JpegLs.encode(JpegLs.Image(24, 18, 12, samples))
    var threw = 0
    for (_ <- 0 until 200) {
      val b = good.clone()
      for (_ <- 0 to rng.nextInt(4))
        b(2 + rng.nextInt(b.length - 2)) = rng.nextInt(256).toByte
      if (attempt(JpegLs.decode(b), "jls")) threw += 1
    }
    info(s"jls: $threw/200 corruptions threw, rest decoded to garbage; none hung")
    // every 2-byte window gets hostile big-endian shorts — covers the
    // SOF55 width/height (2^32-sample allocs), LSE presets, segment lengths
    for (hostile <- Seq(0xffff, 0x8001, 0x0001); off <- 2 until math.min(64, good.length - 2)) {
      val b = good.clone()
      b(off) = ((hostile >> 8) & 0xff).toByte
      b(off + 1) = (hostile & 0xff).toByte
      attempt(JpegLs.decode(b), s"jls@$off=$hostile")
    }
    for (cut <- 0 until good.length by 7)
      attempt(JpegLs.decode(java.util.Arrays.copyOf(good, cut)), s"jls cut=$cut")
  }

  test("AVI: random corruption, hostile chunk lengths, truncation terminate promptly") {
    val jpegs = (0 until 6).map { i =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 8) img.getRaster.setSample(x, y, 0, 30 * i)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val good = Avi.mux(8, 8, fps = 5, jpegs)
    val rng = new scala.util.Random(619)
    var threw = 0
    for (_ <- 0 until 200) {
      val b = good.clone()
      for (_ <- 0 to rng.nextInt(4))
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      if (attempt(Avi.demux(b), "avi")) threw += 1
    }
    info(s"avi: $threw/200 corruptions threw, rest demuxed to garbage; none hung")
    for (hostile <- Seq(0x7fffffff, -2, -8); off <- 12 until (good.length - 4) by 4) {
      val b = good.clone()
      b(off) = (hostile & 0xff).toByte
      b(off + 1) = ((hostile >> 8) & 0xff).toByte
      b(off + 2) = ((hostile >> 16) & 0xff).toByte
      b(off + 3) = ((hostile >> 24) & 0xff).toByte
      attempt(Avi.demux(b), s"avi@$off=$hostile")
    }
    for (cut <- 0 until good.length by 7)
      attempt(Avi.demux(java.util.Arrays.copyOf(good, cut)), s"avi cut=$cut")
  }
}
