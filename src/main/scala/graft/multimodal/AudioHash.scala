package graft.multimodal

/** Perceptual AUDIO fingerprint — the audio twin of [[Phash]]: a 63-bit
  * amplitude-envelope hash in pure integer arithmetic, so a SQL oracle
  * replays it exactly and two engines can never disagree by a ulp.
  *
  * Construction (envelope shape, the robust-to-small-noise analogue of
  * the spectral-band comparisons in Haitsma & Kalker 2002's audio
  * fingerprint, with time-domain energy cells standing in for FFT bands
  * to stay FP-free): the clip is cut into 9 windows × 8 sub-cells = 72
  * equal ranges; cell energy = Σ|sample| (integer); bit (w, b) is set
  * when cell (w, b) has more energy than its right neighbor (w, b+1) —
  * 7 comparisons per window, 63 bits. Additive ±1 noise on a fraction of
  * samples moves a 32-sample cell sum by ~±2 against typical neighbor
  * gaps of ~hundreds, so near-identical clips land within a few bits;
  * unrelated clips differ in ~31.
  *
  * Candidate pairing reuses the q44/q70 band machinery (4×16-bit bands →
  * bucket join → exact hamming). Production path: decodeAudio (WAV/PCM,
  * multimodal layer) → quantize to ints → [[hash]] in one scan;
  * `queries/AudioQueries` is the oracle-replayable declared twin.
  */
object AudioHash {
  val Windows = 9
  val Sub = 8
  val Cells: Int = Windows * Sub // 72

  /** 63-bit envelope hash of integer PCM samples (any length ≥ Cells;
    * cell c covers the equal range [c·n/72, (c+1)·n/72)). */
  def hash(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= Cells, s"need at least $Cells samples, got $n")
    val e = new Array[Long](Cells)
    var c = 0
    while (c < Cells) {
      val lo = (c.toLong * n / Cells).toInt
      val hi = ((c + 1).toLong * n / Cells).toInt
      var acc = 0L
      var i = lo
      while (i < hi) { acc += math.abs(samples(i)); i += 1 }
      e(c) = acc
      c += 1
    }
    var h = 0L
    var w = 0
    while (w < Windows) {
      var b = 0
      while (b < Sub - 1) {
        if (e(w * Sub + b) > e(w * Sub + b + 1)) h |= 1L << (w * 7 + b)
        b += 1
      }
      w += 1
    }
    h
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
