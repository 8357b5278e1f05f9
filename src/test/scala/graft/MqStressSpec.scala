package graft.sources
import org.scalatest.funsuite.AnyFunSuite

/** MQ coder endurance: long 50/50 streams force the rare carry paths
  * (carry landing on a stuffed byte appears only every ~10 KB). */
class MqStressSpec extends AnyFunSuite {
  test("MQ coder: long random streams round-trip") {
    val rng = new scala.util.Random(1234)
    for (trial <- 0 until 6) {
      val n = 300000
      val ncx = 1 + trial % 4
      val cxs = Array.fill(n)(rng.nextInt(ncx))
      val bits = Array.fill(n)(rng.nextInt(2))
      val enc = new Jpeg2000.MqEncoder
      for (i <- 0 until n) enc.encode(cxs(i), bits(i))
      val seg = enc.finish()
      val dec = new Jpeg2000.MqDecoder(seg, 0, seg.length)
      var bad = -1; var i = 0
      while (i < n && bad < 0) { if (dec.decode(cxs(i)) != bits(i)) bad = i; i += 1 }
      assert(bad == -1, s"trial $trial: first mismatch at symbol $bad of $n (seg ${seg.length}B)")
    }
  }

  test("MQ decoder symbol rate (informational)") {
    // worst-case 50/50 bits over 4 contexts — the entropy floor CodecBench's
    // speckle frame sits near; decisions/s here bounds J2K decode MB/s
    val rng = new scala.util.Random(7)
    val n = 2000000
    val cxs = Array.fill(n)(rng.nextInt(4))
    val bits = Array.fill(n)(rng.nextInt(2))
    val enc = new Jpeg2000.MqEncoder
    for (i <- 0 until n) enc.encode(cxs(i), bits(i))
    val seg = enc.finish()
    def run(): Long = {
      val dec = new Jpeg2000.MqDecoder(seg, 0, seg.length)
      var acc = 0L; var i = 0
      while (i < n) { acc += dec.decode(cxs(i)); i += 1 }
      acc
    }
    run(); run() // JIT warmup
    val t0 = System.nanoTime()
    val acc = run()
    val msymS = n / ((System.nanoTime() - t0) / 1e3)
    info(f"$msymS%.0f Msym/s (checksum $acc)")
    assert(acc > 0)
  }
}
