package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** JPEG 2000 codec (T.800): each layer round-trips — MQ coder, tag
  * trees, 5/3 and 9/7 lifting — then the full codestream (lossless
  * bit-exact, lossy PSNR-bounded) and the DICOM .4.90/.4.91 wraps, plus
  * the loud out-of-profile failures. */
class Jpeg2000Spec extends AnyFunSuite {

  test("MQ coder: random context/bit sequences round-trip") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val n = 1 + rng.nextInt(3000)
      // biased bits exercise MPS/LPS paths; contexts exercise state table
      val cxs = Array.fill(n)(rng.nextInt(19))
      val bits = Array.fill(n)(if (rng.nextInt(10) == 0) rng.nextInt(2) else 0)
      val enc = new Jpeg2000.MqEncoder
      for (i <- 0 until n) enc.encode(cxs(i), bits(i))
      val seg = enc.finish()
      val dec = new Jpeg2000.MqDecoder(seg, 0, seg.length)
      for (i <- 0 until n)
        assert(dec.decode(cxs(i)) == bits(i), s"trial $trial, symbol $i of $n")
    }
  }

  test("tag tree: random grids round-trip thresholds and values") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(7); val h = 1 + rng.nextInt(7)
      val vals = Array.fill(h, w)(rng.nextInt(6))
      val et = new Jpeg2000.TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) et.setValue(x, y, vals(y)(x))
      et.build()
      val out = new Jpeg2000.HeaderBitWriter
      for (y <- 0 until h; x <- 0 until w) et.encodeValue(x, y, out)
      val bytes = out.flush()
      val in = new Jpeg2000.HeaderBitReader(bytes, 0)
      val dt = new Jpeg2000.TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w)
        assert(dt.decodeValue(x, y, in) == vals(y)(x), s"trial $trial leaf ($x,$y)")
    }
  }

  test("5/3 lifting: forward then inverse is identity (all parities)") {
    val rng = new scala.util.Random(3)
    for (n <- Seq(1, 2, 3, 4, 5, 8, 17, 64, 101)) {
      val a = Array.fill(n)(rng.nextInt(1 << 16) - (1 << 15))
      val t = a.clone()
      Jpeg2000.fwd53(t, n)
      Jpeg2000.inv53(t, n)
      assert(t.toSeq == a.toSeq, s"n=$n")
    }
  }

  private def roundTrip(img: Jpeg2000.Image, label: String): Unit = {
    val bytes = Jpeg2000.encode(img)
    val back = Jpeg2000.decode(bytes)
    assert(back.width == img.width && back.height == img.height, label)
    assert(back.precision == img.precision && back.signed == img.signed, label)
    assert(back.samples.toSeq == img.samples.toSeq, s"$label: samples differ")
  }

  test("codec: random images round-trip bit-exactly across sizes and precisions") {
    val rng = new scala.util.Random(11)
    for ((w, h) <- Seq((64, 64), (65, 33), (13, 7), (128, 61), (1, 1), (1, 17), (300, 2))) {
      for (prec <- Seq(8, 12, 16)) {
        val samples = Array.fill(w * h)(rng.nextInt(1 << prec))
        roundTrip(Jpeg2000.Image(w, h, prec, signed = false, samples), s"${w}x$h/$prec")
      }
    }
  }

  test("codec: signed samples round-trip") {
    val rng = new scala.util.Random(13)
    for ((w, h) <- Seq((32, 32), (21, 45))) {
      val samples = Array.fill(w * h)(rng.nextInt(1 << 12) - (1 << 11))
      roundTrip(Jpeg2000.Image(w, h, 12, signed = true, samples), s"signed ${w}x$h")
    }
  }

  test("codec: constant and sparse images (empty packets, run-length mode)") {
    roundTrip(Jpeg2000.Image(70, 70, 16, signed = false, Array.fill(4900)(0)), "all-zero")
    roundTrip(Jpeg2000.Image(70, 70, 16, signed = false, Array.fill(4900)(0xffff)), "all-max")
    roundTrip(Jpeg2000.Image(50, 50, 8, signed = false, Array.fill(2500)(127)), "mid-gray")
    val rng = new scala.util.Random(17)
    val sparse = Array.fill(96 * 96)(0)
    for (_ <- 0 until 20) sparse(rng.nextInt(sparse.length)) = 1 + rng.nextInt(0xfffe)
    roundTrip(Jpeg2000.Image(96, 96, 16, signed = false, sparse), "sparse spikes")
    // smooth gradient: deep LL energy, high bands near-zero
    val grad = Array.tabulate(80 * 80)(i => (i % 80) * 100 / 79 + (i / 80) * 100 / 79)
    roundTrip(Jpeg2000.Image(80, 80, 8, signed = false, grad), "gradient")
  }

  test("codec: larger-than-code-block image exercises multi-block packets") {
    val rng = new scala.util.Random(23)
    val w = 200; val h = 150
    val samples = Array.tabulate(w * h)(i =>
      if ((i / w) < 40) 0 else rng.nextInt(1 << 16)) // one quiet band of blocks
    roundTrip(Jpeg2000.Image(w, h, 16, signed = false, samples), "200x150/16")
  }

  test("9/7 lifting: forward then inverse is identity to machine precision") {
    val rng = new scala.util.Random(31)
    for (n <- Seq(1, 2, 3, 4, 5, 8, 17, 64, 101)) {
      val a = Array.fill(n)(rng.nextDouble() * 512 - 256)
      val t = a.clone()
      Jpeg2000.fwd97(t, n)
      Jpeg2000.inv97(t, n)
      for (i <- 0 until n)
        assert(math.abs(t(i) - a(i)) < 1e-9, s"n=$n i=$i: ${t(i)} vs ${a(i)}")
    }
  }

  test("9/7 lifting: subband nominal gains match GainByOrient (1x low DC, 2x high Nyquist)") {
    // constant signal: lowpass must carry the constant unchanged (gain 1),
    // highpass must vanish — that normalization is what makes Rb = depth +
    // GainByOrient the right dynamic range for quantization
    val n = 64
    val const = Array.fill(n)(7.0)
    Jpeg2000.fwd97(const, n)
    for (i <- 0 until n by 2) assert(math.abs(const(i) - 7.0) < 1e-9, s"low $i")
    for (i <- 1 until n by 2) assert(math.abs(const(i)) < 1e-9, s"high $i")
    // Nyquist signal: all energy to highpass at gain 2
    val nyq = Array.tabulate(n)(i => if (i % 2 == 0) 1.0 else -1.0)
    Jpeg2000.fwd97(nyq, n)
    for (i <- 0 until n by 2) assert(math.abs(nyq(i)) < 1e-9, s"low $i")
    // interior odd samples (away from the symmetric boundary)
    for (i <- 5 until n - 5 by 2) assert(math.abs(nyq(i) + 2.0) < 1e-9, s"high $i = ${nyq(i)}")
  }

  private def psnr(a: Array[Int], b: Array[Int], maxVal: Double): Double = {
    var se = 0.0
    for (i <- a.indices) { val d = (a(i) - b(i)).toDouble; se += d * d }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(maxVal * maxVal * a.length / se)
  }

  test("9/7 codec: near-lossless at unit step, PSNR-bounded when coarse") {
    val rng = new scala.util.Random(37)
    for ((w, h) <- Seq((64, 64), (65, 33), (128, 61))) {
      val samples = Array.fill(w * h)(rng.nextInt(256))
      val img = Jpeg2000.Image(w, h, 8, signed = false, samples)
      // unit step (deltaShift=0, mu=0): error <= ~1 LSB per sample
      val fine = Jpeg2000.decode(Jpeg2000.encode97(img))
      assert(fine.width == w && fine.height == h && fine.precision == 8 && !fine.signed)
      assert(psnr(samples, fine.samples, 255) > 40, s"fine ${w}x$h: ${psnr(samples, fine.samples, 255)}")
      // coarse step (delta = 8 * 1.25 = 10): genuinely lossy but bounded
      val coarse = Jpeg2000.decode(Jpeg2000.encode97(img, deltaShift = 3, mu = 512))
      assert(psnr(samples, coarse.samples, 255) > 26, s"coarse ${w}x$h: ${psnr(samples, coarse.samples, 255)}")
      assert(!(coarse.samples sameElements samples), "coarse step must actually quantize")
    }
    // 16-bit (the DICOM case) and signed data
    val s16 = Array.fill(96 * 80)(rng.nextInt(1 << 16))
    val d16 = Jpeg2000.decode(Jpeg2000.encode97(
      Jpeg2000.Image(96, 80, 16, signed = false, s16), deltaShift = 2))
    assert(psnr(s16, d16.samples, 65535) > 60, s"16-bit: ${psnr(s16, d16.samples, 65535)}")
    val sSigned = Array.fill(48 * 48)(rng.nextInt(1 << 12) - (1 << 11))
    val dSigned = Jpeg2000.decode(Jpeg2000.encode97(
      Jpeg2000.Image(48, 48, 12, signed = true, sSigned)))
    assert(dSigned.signed && psnr(sSigned, dSigned.samples, 4095) > 40)
    // smooth gradient: deep LL energy concentrates, high bands near-zero
    val grad = Array.tabulate(80 * 80)(i => (i % 80) * 3 + (i / 80) * 2)
    val dGrad = Jpeg2000.decode(Jpeg2000.encode97(
      Jpeg2000.Image(80, 80, 10, signed = false, grad), deltaShift = 2))
    assert(psnr(grad, dGrad.samples, 1023) > 40)
  }

  test("9/7 codec: scalar-derived QCD (style 1) decodes") {
    // nl=0 (one band): derived and expounded coincide, so flipping the
    // Sqcd style byte of a 1-value expounded QCD yields a valid derived
    // stream that must reconstruct identically
    val rng = new scala.util.Random(41)
    val samples = Array.fill(1 * 17)(rng.nextInt(256))
    val img = Jpeg2000.Image(1, 17, 8, signed = false, samples)
    val expounded = Jpeg2000.encode97(img)
    val qcdOff = 2 + 43 + 14 // SOC + SIZ + COD
    assert(((expounded(qcdOff) & 0xff) << 8 | (expounded(qcdOff + 1) & 0xff)) == 0xff5c)
    val derived = expounded.clone()
    derived(qcdOff + 4) = ((derived(qcdOff + 4) & 0xe0) | 1).toByte
    val a = Jpeg2000.decode(expounded); val b = Jpeg2000.decode(derived)
    assert(a.samples.toSeq == b.samples.toSeq)
  }

  test("out-of-profile codestreams fail loudly by name") {
    val img = Jpeg2000.Image(16, 16, 8, signed = false, Array.fill(256)(5))
    val good = Jpeg2000.encode(img)
    // not a codestream at all
    val e0 = intercept[IllegalArgumentException](Jpeg2000.decode("nope".getBytes))
    assert(e0.getMessage.contains("SOC"))
    // COD transform byte (offset: SOC 2 + SIZ 43 + COD header 13) → 9/7
    val lossy = good.clone(); lossy(2 + 43 + 13) = 0
    val e1 = intercept[IllegalArgumentException](Jpeg2000.decode(lossy))
    assert(e1.getMessage.contains("9/7"))
    // layers field → 2
    val layered = good.clone(); layered(2 + 43 + 7) = 2
    val e2 = intercept[IllegalArgumentException](Jpeg2000.decode(layered))
    assert(e2.getMessage.contains("multi-layer"))
  }

  test("decoder fails corrupt codestreams loudly — no hang, no huge alloc") {
    val rng = new scala.util.Random(99)
    val samples = Array.fill(32 * 32)(rng.nextInt(256))
    val good = Jpeg2000.encode(Jpeg2000.Image(32, 32, 8, signed = false, samples))
    var threw = 0
    for (_ <- 0 until 300) {
      val b = good.clone()
      // corrupt 1-4 bytes anywhere after SOC (headers, packet, body)
      for (_ <- 0 to rng.nextInt(4))
        b(2 + rng.nextInt(b.length - 2)) = rng.nextInt(256).toByte
      try { Jpeg2000.decode(b); () }
      catch { case _: Exception => threw += 1 } // loud is fine; silence is fine; hanging is not
    }
    info(s"$threw/300 corruptions threw, rest decoded to garbage; none hung")
    // truncation at every prefix length also terminates
    for (cut <- 2 until good.length by 7) {
      try { Jpeg2000.decode(java.util.Arrays.copyOf(good, cut)); () }
      catch { case _: Exception => () }
    }
  }

  test("DICOM JPEG 2000 Lossless (.4.90) wrap round-trips bit-exactly") {
    val rng = new scala.util.Random(29)
    val rows = 37; val cols = 53
    val data = Array.fill(rows * cols)(rng.nextInt(1 << 16).toFloat)
    val file = Dicom.encodeJpeg2000(rows, cols, data,
      position = Seq(1f, 2f, 3f), seriesUid = "9.8.7", instanceNumber = 4)
    val s = Dicom.decode(file)
    assert(s.rows == rows && s.cols == cols)
    assert(s.seriesUid == "9.8.7" && s.instanceNumber == 4)
    assert(s.position == Seq(1f, 2f, 3f))
    assert(s.data.toSeq == data.toSeq, "pixel data must round-trip bit-exactly")
  }

  test("DICOM lossy JPEG 2000 (.4.91) wrap decodes within the step-size bound") {
    val rng = new scala.util.Random(43)
    val rows = 41; val cols = 59
    val data = Array.fill(rows * cols)(rng.nextInt(1 << 12).toFloat)
    val file = Dicom.encodeJpeg2000Lossy(rows, cols, data, deltaShift = 2, mu = 256,
      position = Seq(4f, 5f, 6f), seriesUid = "3.2.1", instanceNumber = 9)
    val s = Dicom.decode(file)
    assert(s.rows == rows && s.cols == cols)
    assert(s.seriesUid == "3.2.1" && s.instanceNumber == 9)
    assert(s.position == Seq(4f, 5f, 6f))
    // delta = 4 * 1.125 = 4.5; synthesis keeps per-sample error a small
    // multiple of that — assert a loose but meaningful bound
    val maxErr = data.indices.map(i => math.abs(s.data(i) - data(i))).max
    assert(maxErr < 32, s"max abs error $maxErr for step 4.5")
    assert(data.indices.exists(i => s.data(i) != data(i)), "must be genuinely lossy")
  }

  test("corrupt lossy codestreams fail loudly — no hang, no huge alloc") {
    val rng = new scala.util.Random(101)
    val samples = Array.fill(32 * 32)(rng.nextInt(256))
    val good = Jpeg2000.encode97(
      Jpeg2000.Image(32, 32, 8, signed = false, samples), deltaShift = 1)
    var threw = 0
    for (_ <- 0 until 300) {
      val b = good.clone()
      for (_ <- 0 to rng.nextInt(4))
        b(2 + rng.nextInt(b.length - 2)) = rng.nextInt(256).toByte
      try { Jpeg2000.decode(b); () }
      catch { case _: Exception => threw += 1 }
    }
    info(s"$threw/300 corruptions threw, rest decoded to garbage; none hung")
    for (cut <- 2 until good.length by 7) {
      try { Jpeg2000.decode(java.util.Arrays.copyOf(good, cut)); () }
      catch { case _: Exception => () }
    }
  }
}
