package graft

import graft.sources.JpegLs
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** T.87 codec round-trips — pure JVM, no Spark session needed. Patterns are
  * chosen to force every coder path: regular mode (gradients), run mode with
  * full/partial segments, line-end run breaks, both run-interruption types
  * (Ra==Rb and Ra!=Rb), the k=0 bias-inverted mapping, the qbpp escape of
  * the limited Golomb code, and the 0xFF bit-stuffing. */
class JpegLsSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, precision: Int, data: Array[Int]): Unit = {
    val bytes = JpegLs.encode(JpegLs.Image(w, h, precision, data))
    val back = JpegLs.decode(bytes)
    assert(back.width == w && back.height == h && back.precision == precision)
    assert(back.samples.toSeq == data.toSeq,
      s"lossless round-trip mismatch at ${w}x$h p$precision")
  }

  test("constant image (pure run mode, line-end breaks)") {
    roundTrip(7, 5, 8, Array.fill(35)(200))
    roundTrip(300, 3, 8, Array.fill(900)(0)) // runs longer than the largest segment
    roundTrip(1, 1, 8, Array(255))
  }

  test("horizontal and vertical gradients (pure regular mode)") {
    roundTrip(16, 16, 8, Array.tabulate(256)(i => i % 16 * 17))
    roundTrip(16, 16, 8, Array.tabulate(256)(i => i / 16 * 17))
    roundTrip(32, 8, 12, Array.tabulate(256)(i => (i * 16) % 4096))
  }

  test("runs with both interruption types") {
    // rows of constant 10 with single different samples → RItype 1 (Ra==Rb)
    val a = Array.fill(20 * 4)(10)
    a(7) = 99; a(25) = 3; a(63) = 77
    roundTrip(20, 4, 8, a)
    // run over a changed previous line → RItype 0 (Ra != Rb)
    val b = Array.tabulate(20 * 4)((i: Int) => if (i < 20) i * 3 else 42)
    roundTrip(20, 4, 8, b)
  }

  test("random images, all precisions (regular + run + escape paths)") {
    val rnd = new Random(7)
    for (p <- Seq(2, 4, 8, 10, 12, 16); trial <- 1 to 3) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val maxval = (1 << p) - 1
      // mix: pure noise (worst case) and run-heavy plateaus
      val noise = Array.fill(w * h)(rnd.nextInt(maxval + 1))
      roundTrip(w, h, p, noise)
      val plateau = Array.tabulate(w * h)(i => if (rnd.nextInt(5) == 0) rnd.nextInt(maxval + 1) else maxval / 2)
      roundTrip(w, h, p, plateau)
    }
  }

  test("alternating extremes exercise bit-stuffing and the Golomb escape") {
    val w = 33; val h = 9
    val data = Array.tabulate(w * h)(i => if (i % 2 == 0) 0 else 65535)
    roundTrip(w, h, 16, data)
  }

  test("decoder honors spec default thresholds when LSE is absent") {
    val rnd = new Random(11)
    val w = 21; val h = 13
    val data = Array.fill(w * h)(rnd.nextInt(256))
    val withLse = JpegLs.encode(JpegLs.Image(w, h, 8, data))
    // our encoder's presets equal the spec defaults, so splicing the LSE
    // segment out (15 bytes at offset 15: SOI 2 + SOF55 13) must decode
    // identically through the default-threshold formulas
    assert((withLse(15) & 0xff) == 0xff && (withLse(16) & 0xff) == 0xf8, "LSE expected at 15")
    val noLse = withLse.take(15) ++ withLse.drop(30)
    assert(JpegLs.decode(noLse).samples.toSeq == data.toSeq)
  }

  test("unsupported modes fail loudly by name") {
    val bytes = JpegLs.encode(JpegLs.Image(4, 4, 8, Array.fill(16)(7)))
    // flip NEAR byte in SOS (offset: SOI 2 + SOF 13 + LSE 15 + SOS marker/len 4 + ns 1 + comp 2 → NEAR at 37)
    val near = bytes.clone()
    assert((near(30) & 0xff) == 0xff && (near(31) & 0xff) == 0xda, "SOS expected at 30")
    near(37) = 2
    val e = intercept[IllegalArgumentException](JpegLs.decode(near))
    assert(e.getMessage.contains("near-lossless"))
  }
}
