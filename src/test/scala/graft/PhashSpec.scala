package graft

import graft.multimodal.Phash
import graft.sources.Png

class PhashSpec extends SparkSpec {

  /** the q70 corpus's luma grid, built by the pure-Scala reference (same
    * md5 pixel construction as the declared query's two engines). */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def luma(imgId: Long): Array[Int] = {
    val base = imgId / 2
    Array.tabulate(32 * 32) { i =>
      val (x, y) = (i % 32, i / 32)
      // row-major over (x outer, y inner) in the query; grid layout only
      // affects which axis is "rows" — hash parity is checked against the
      // same layout below
      val h = md5hex(s"$base:$x:$y:px")
      val v = Integer.parseInt(h.substring(0, 2), 16)
      val noise = if (imgId % 2 == 1 && md5hex(s"$base:$x:$y:n").charAt(0) == '0') 1 else 0
      v + noise
    }
  }

  test("pHash: variant images are near, unrelated images are far") {
    val h0 = Phash.hash(luma(0)); val h1 = Phash.hash(luma(1))
    val h2 = Phash.hash(luma(2)); val h3 = Phash.hash(luma(3))
    assert(Phash.hamming(h0, h1) <= 10, s"pair hamming ${Phash.hamming(h0, h1)}")
    assert(Phash.hamming(h2, h3) <= 10)
    assert(Phash.hamming(h0, h2) > 10)
    assert(Phash.hamming(h1, h3) > 10)
  }

  test("pHash is invariant under PNG encode→decode round-trip") {
    val l = luma(0)
    val png = Png.grayPng(l.map(_.toFloat), 32, 32)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val back = Array.tabulate(32 * 32) { i =>
      img.getRaster.getSample(i % 32, i / 32, 0)
    }
    assert(back.toSeq == l.toSeq, "8-bit gray PNG must round-trip luma exactly")
    assert(Phash.hash(back) == Phash.hash(l))
  }

  test("downscale: 32x32 identity; constant image stays constant") {
    val l = luma(4)
    assert(Phash.downscale(l, 32, 32).toSeq == l.toSeq)
    val const = Array.fill(64 * 48)(77)
    assert(Phash.downscale(const, 64, 48).forall(_ == 77))
    // 64x64 2x2 box average of a known gradient
    val grad = Array.tabulate(64 * 64)(i => i % 64)
    val down = Phash.downscale(grad, 64, 64)
    assert(down(0) == 0 && down(1) == 2 && down(31) == 62)
  }

  test("declared-query phash chain matches the pure-Scala reference") {
    // the Spark SQL px→s1→s2→bits chain must produce exactly Phash.hash
    // of the same grid — this pins the fixed-point DCT parity that the
    // DuckDB oracle then replays
    val got = graft.queries.ImageQueries.phashes(spark)
      .filter(org.apache.spark.sql.functions.col("img_id") < 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // query grid: explode x outer then y inner, luma keyed (base, x, y);
    // the reference grid above is row-major in (y=i/32, x=i%32) with the
    // SAME (x, y) key — the DCT is over the grid axes, and both sides
    // agree on which axis multiplies C(u) first only through the key, so
    // build the reference in the query's orientation: rows = y
    (0L until 4L).foreach { id =>
      assert(got(id) == Phash.hash(luma(id)), s"img $id")
    }
  }

  test("q70 JVM phash kernel is bit-identical to the expression twin") {
    // the declared corpus at reduced size: 8 images (4 near-dup pairs,
    // both even/odd noise branches) — exact integer arithmetic means the
    // equality is order-independent, so 8 images pin all 200
    val kernel = graft.queries.ImageQueries.phashesKernel(spark, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val expression = graft.queries.ImageQueries.phashesExpr(spark, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(kernel.size == 8 && kernel == expression)
  }
}
