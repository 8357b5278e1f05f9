package graft.multimodal

/** Perceptual image hash (pHash) over 32×32 luma — INTEGER fixed-point
  * DCT so the hash is bit-reproducible across engines and platforms:
  * the DCT-II basis is rounded to 13-bit fixed point
  * (round(cos(π(2x+1)u/64)·8192)), all accumulation is exact integer
  * arithmetic, and the bit rule is the mean-threshold variant compared
  * cross-multiplied (63·c > Σc — no division). 63 bits: the 8×8
  * low-frequency block minus the DC term.
  *
  * Standard recipe (public: Zauner 2010, "Implementation and Benchmarking
  * of Perceptual Image Hash Functions"; the pHash.org algorithm), with the
  * FP-free fixed-point twist so a SQL oracle replays it exactly —
  * `queries/ImageQueries` emits this same basis as SQL literals.
  *
  * Production path at corpus scale: decode (multimodal layer) → downscale
  * to 32×32 luma → [[hash]] per image inside one scan; candidate pairing
  * reuses the q44 SimHash band machinery (4×16-bit bands → bucket join →
  * exact hamming ≤ threshold inside buckets).
  */
object Phash {
  val N = 32
  val Scale = 8192L // 2^13 fixed-point

  /** C(u)(x) = round(cos(π(2x+1)u/64)·8192), u ∈ 0..7, x ∈ 0..31.
    * StrictMath (fdlibm), not Math: Math.cos may differ by 1 ulp across
    * JVMs/platforms, and a value landing on a round-half boundary would
    * flip a basis entry — StrictMath pins the basis bit-for-bit so hashes
    * persisted on one platform compare equal on another. */
  lazy val basis: Array[Array[Long]] = Array.tabulate(8, N) { (u, x) =>
    Math.round(StrictMath.cos(math.Pi * (2 * x + 1) * u / (2.0 * N)) * Scale)
  }

  /** 63-bit pHash of a row-major 32×32 luma grid (values 0..255).
    * Bit idx-1 (idx = u·8+v ∈ 1..63) is set when 63·coef(u,v) > Σ coefs
    * (strict; exact integer compare). */
  def hash(luma: Array[Int]): Long = {
    require(luma.length == N * N, s"expected ${N * N} luma values, got ${luma.length}")
    // separable DCT: s1(y)(u) = Σ_x luma(y,x)·C(u,x)
    val s1 = Array.tabulate(N, 8) { (y, u) =>
      var acc = 0L
      var x = 0
      while (x < N) { acc += luma(y * N + x) * basis(u)(x); x += 1 }
      acc
    }
    // s2(u)(v) = Σ_y s1(y)(u)·C(v,y)
    val coefs = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var y = 0
        while (y < N) { acc += s1(y)(u) * basis(v)(y); y += 1 }
        coefs(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    var total = 0L
    var i = 1
    while (i < 64) { total += coefs(i); i += 1 }
    var h = 0L
    i = 1
    while (i < 64) {
      if (63L * coefs(i) > total) h |= 1L << (i - 1)
      i += 1
    }
    h
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** average-pool an arbitrary grayscale image down to 32×32 (box filter,
    * integer truncation — deterministic). */
  def downscale(luma: Array[Int], w: Int, h: Int): Array[Int] = {
    require(w >= 1 && h >= 1 && luma.length == w * h)
    Array.tabulate(N * N) { i =>
      val (oy, ox) = (i / N, i % N)
      val (y0, y1) = (oy * h / N, math.max(oy * h / N + 1, (oy + 1) * h / N))
      val (x0, x1) = (ox * w / N, math.max(ox * w / N + 1, (ox + 1) * w / N))
      var acc = 0L; var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { acc += luma(y * w + x); n += 1; x += 1 }
        y += 1
      }
      (acc / n).toInt
    }
  }
}
