package graft.tools

import graft.sources.{Dicom, JpegLs, Jpeg2000}

/** Single-core DICOM codec throughput anchor: encode/decode a realistic
  * 256x256 16-bit cine frame (smooth anatomy-like gradient + speckle
  * noise) through each supported transfer syntax and print MB/s of raw
  * pixel payload. The ingest path (`binaryFile` scan + decode UDF) is
  * embarrassingly parallel across Spark tasks, so per-core codec cost ×
  * core count bounds cluster ingest throughput — measured, not guessed.
  *
  * Run: `sbt 'runMain graft.tools.CodecBench'` → one JSON line.
  */
object CodecBench {

  def main(args: Array[String]): Unit = {
    val rows = 256; val cols = 256
    val rng = new scala.util.Random(42)
    // anatomy-ish: low-frequency bowl + mid-frequency ripple + speckle
    val frame = Array.tabulate(rows * cols) { i =>
      val y = i / cols; val x = i % cols
      val dx = (x - 128) / 128.0; val dy = (y - 128) / 128.0
      val bowl = 12000 * (1 - (dx * dx + dy * dy) / 2)
      val ripple = 1500 * math.sin(x / 9.0) * math.cos(y / 11.0)
      val speckle = rng.nextGaussian() * 300
      math.max(0, math.min(0xffff, (bowl + ripple + speckle).toInt)).toFloat
    }
    val rawBytes = rows.toLong * cols * 2

    def time[A](reps: Int)(f: => A): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      (System.nanoTime() - t0) / 1e9
    }

    final case class Res(name: String, encMBs: Double, decMBs: Double, ratio: Double)

    def bench(name: String, reps: Int,
              enc: () => Array[Byte], dec: Array[Byte] => Unit): Res = {
      val payload = enc() // size probe
      val warm = math.max(3, reps / 3) // let the JIT settle before timing
      time(warm)(enc()); time(warm)(dec(payload))
      val encSec = time(reps)(enc())
      val decSec = time(reps)(dec(payload))
      Res(name,
        rawBytes * reps / encSec / 1e6,
        rawBytes * reps / decSec / 1e6,
        payload.length.toDouble / rawBytes)
    }

    val results = Seq(
      bench("explicit_le", 200,
        () => Dicom.encode(rows, cols, frame),
        b => Dicom.decode(b)),
      bench("rle_1.2.5", 100,
        () => Dicom.encodeRle(rows, cols, frame),
        b => Dicom.decode(b)),
      bench("jpegls_4.80", 30,
        () => Dicom.encodeJpegLs(rows, cols, frame),
        b => Dicom.decode(b)),
      bench("jpeg2000_4.90", 10,
        () => Dicom.encodeJpeg2000(rows, cols, frame),
        b => Dicom.decode(b)),
      // codec-only rates (no part-10 wrapper), for the codec-vs-parse split
      bench("jpegls_codec_only", 30, () => {
        val s = frame.map(v => math.round(v))
        JpegLs.encode(JpegLs.Image(cols, rows, 16, s))
      }, b => JpegLs.decode(b)),
      bench("jpeg2000_codec_only", 10, () => {
        val s = frame.map(v => math.round(v))
        Jpeg2000.encode(Jpeg2000.Image(cols, rows, 16, signed = false, s))
      }, b => Jpeg2000.decode(b)),
      // same codec on a low-noise frame: J2K decode rate is CONTENT-bound
      // (it runs at the MQ coder's decision rate — ~73 Msym/s measured in
      // MqStressSpec — and smooth content codes far fewer decisions/sample
      // than the speckle frame above); real cine sits between the two rows
      bench("jpeg2000_smooth", 10, () => {
        val smooth = Array.tabulate(rows * cols) { i =>
          val y = i / cols; val x = i % cols
          val dx = (x - 128) / 128.0; val dy = (y - 128) / 128.0
          math.max(0, (12000 * (1 - (dx * dx + dy * dy) / 2)).toInt)
        }
        Jpeg2000.encode(Jpeg2000.Image(cols, rows, 16, signed = false, smooth))
      }, b => Jpeg2000.decode(b)),
      // and the lossy 9/7 path at a clinically-typical step (delta = 4):
      // quantization drops the noisiest planes, so lossy decode is FASTER
      bench("jpeg2000_lossy_97", 10, () => {
        val s = frame.map(v => math.round(v))
        Jpeg2000.encode97(Jpeg2000.Image(cols, rows, 16, signed = false, s), deltaShift = 2)
      }, b => Jpeg2000.decode(b)))

    val fields = results.map(r =>
      f""""${r.name}":{"encode_MBps":${r.encMBs}%.1f,"decode_MBps":${r.decMBs}%.1f,"compressed_ratio":${r.ratio}%.3f}""")
    println(s"""{"metric":"codec_throughput","frame":"${rows}x$cols/16bit",${fields.mkString(",")}}""")
  }
}
