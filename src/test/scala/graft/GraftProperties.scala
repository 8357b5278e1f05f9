package graft

import graft.operators.EnclosingCircle
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure kernels (SURVEY §5.3). */
object GraftProperties extends Properties("graft") {

  private val point: Gen[(Double, Double)] =
    for (x <- Gen.choose(0, 40); y <- Gen.choose(0, 40)) yield (x.toDouble, y.toDouble)

  property("welzl circle encloses every input point") =
    Prop.forAll(Gen.nonEmptyListOf(point)) { pts =>
      val c = EnclosingCircle.welzl(pts)
      pts.forall(p => math.hypot(p._1 - c.cx, p._2 - c.cy) <= c.r + 1e-7)
    }

  property("welzl is permutation-invariant") =
    Prop.forAll(Gen.nonEmptyListOf(point)) { pts =>
      val a = EnclosingCircle.welzl(pts)
      val b = EnclosingCircle.welzl(pts.reverse)
      math.abs(a.r - b.r) < 1e-9 && math.hypot(a.cx - b.cx, a.cy - b.cy) < 1e-9
    }

  property("welzl radius is minimal vs 2-point diameter lower bound") =
    Prop.forAll(Gen.nonEmptyListOf(point)) { pts =>
      val c = EnclosingCircle.welzl(pts)
      // any two points give a lower bound of half their distance
      pts.combinations(2).forall {
        case Seq(a, b) => c.r >= math.hypot(a._1 - b._1, a._2 - b._2) / 2 - 1e-7
        case _ => true
      }
    }

  /** model comparator for natural ordering, to pin NaturalSort.natKey. */
  private def natCompare(a: String, b: String): Int = {
    val tok = "([0-9]+|[^0-9]+)".r
    val as = tok.findAllIn(a).toList
    val bs = tok.findAllIn(b).toList
    as.zip(bs).foreach { case (x, y) =>
      val c =
        if (x.forall(_.isDigit) && y.forall(_.isDigit)) BigInt(x).compare(BigInt(y))
        else x.compare(y)
      if (c != 0) return c
    }
    as.length - bs.length
  }

  private val nameGen: Gen[String] = for {
    p1 <- Gen.oneOf("img", "file", "x", "")
    n1 <- Gen.choose(0, 120)
    p2 <- Gen.oneOf("_f", "-", "")
    n2 <- Gen.choose(0, 15)
  } yield s"$p1$n1$p2$n2"

  property("natKey byte order equals natural-compare model order") = {
    // evaluate the Column expression through a tiny local projection
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    Prop.forAll(Gen.listOfN(6, nameGen)) { names =>
      val keyed = spark.createDataFrame(names.map(Tuple1(_))).toDF("name")
        .select(col("name"), graft.operators.NaturalSort.natKey(col("name")).as("k"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val byKey = names.distinct.sortBy(keyed)
      val byModel = names.distinct.sorted(Ordering.fromLessThan[String]((a, b) => natCompare(a, b) < 0))
      // keys must induce the same order wherever the model order is strict
      byKey.zip(byModel).forall { case (x, y) => natCompare(x, y) == 0 }
    }
  }

  property("cents round-trips 2-decimal money exactly") =
    Prop.forAll(Gen.choose(-99999999L, 99999999L)) { c =>
      val x = c / 100.0 // a 2-decimal double
      math.round(x * 100).toLong == c
    }

  // codec round-trip properties: arbitrary shapes/data through the pure-JVM
  // NIfTI-1 and DICOM encoders must decode bit-identically
  private val volGen: Gen[(Int, Int, Int, Int)] = for {
    t <- Gen.choose(1, 3); d <- Gen.choose(1, 4)
    h <- Gen.choose(1, 8); w <- Gen.choose(1, 8)
  } yield (t, d, h, w)

  property("NIfTI-1 encode/decode round-trips any (T,D,1,H,W) float volume") =
    Prop.forAll(volGen, Gen.choose(0, 1000000)) { case ((t, d, h, w), seed) =>
      val n = t * d * h * w
      val data = Array.tabulate(n)(i => ((i * 2654435761L + seed) % 4096).toFloat / 8f - 200f)
      val v = graft.sources.Nifti.decode(
        graft.sources.Nifti.encode(Seq(t, d, 1, h, w), data, Seq(1f, 2f, 3f)))
      v.shape == Seq(t, d, 1, h, w) && v.data.toSeq == data.toSeq &&
        v.pixdim == Seq(1f, 2f, 3f)
    }

  property("DICOM encode/decode round-trips any uint16 slice + geometry") =
    Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 16), Gen.choose(0, 1000000)) {
      (rows, cols, seed) =>
        val data = Array.tabulate(rows * cols)(i => ((i * 131 + seed) % 65536).toFloat)
        val pos = Seq(seed % 10 - 5f, seed % 7 - 3f, seed % 13 + 0f)
        val sl = graft.sources.Dicom.decode(
          graft.sources.Dicom.encode(rows, cols, data, position = pos,
            instanceNumber = seed % 100))
        sl.rows == rows && sl.cols == cols && sl.data.toSeq == data.toSeq &&
          sl.position == pos && sl.instanceNumber == seed % 100
    }

  // ---- r8: subword segmentation (operators/Subword)

  private val word: Gen[String] =
    Gen.listOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(24))

  property("subword segmentation reassembles the word exactly") =
    Prop.forAll(word) { w =>
      graft.operators.Subword.segment(w).mkString == w
    }

  property("subword count is within [ceil(len/4), len]") =
    Prop.forAll(word) { w =>
      val n = graft.operators.Subword.segment(w).length
      if (w.isEmpty) n == 0
      else n >= (w.length + 3) / 4 && n <= w.length
    }

  property("subword segments are each a vocab unit or a single char") =
    Prop.forAll(word) { w =>
      val units = graft.operators.Subword.defaultVocab.flatMap(_._2).toSet
      graft.operators.Subword.segment(w).forall(t =>
        t.length == 1 || units(t))
    }

  // ---- r8: perceptual hashes (multimodal/Phash, multimodal/AudioHash)

  private val lumaGrid: Gen[Array[Int]] =
    Gen.containerOfN[Array, Int](1024, Gen.choose(0, 255))

  property("pHash of a +1-uniformly-brightened image is unchanged") =
    // DCT is linear and the +1 shift only moves the DC coefficient,
    // which the 63 bits exclude; the mean-threshold compares AC terms
    Prop.forAll(lumaGrid) { g =>
      val b = g.map(v => v + 1)
      graft.multimodal.Phash.hash(g) == graft.multimodal.Phash.hash(b)
    }

  property("audio envelope hash is invariant under sign flip") =
    // cells sum |sample|, so negating the waveform changes nothing
    Prop.forAll(Gen.containerOfN[Array, Int](720, Gen.choose(-127, 127))) { s =>
      graft.multimodal.AudioHash.hash(s) ==
        graft.multimodal.AudioHash.hash(s.map(v => -v))
    }

  property("audio envelope hash is invariant under uniform gain") =
    // E(cell) scales by the gain on both sides of every strict compare
    Prop.forAll(Gen.containerOfN[Array, Int](720, Gen.choose(-127, 127))) { s =>
      graft.multimodal.AudioHash.hash(s) ==
        graft.multimodal.AudioHash.hash(s.map(v => v * 3))
    }

  // ---- sketch-family laws, against the REAL hash arithmetic (the same
  // md5→60-bit derivation Det.hex60 / CountMinSketch.bucket /
  // BloomFilter.position run in-engine, re-spelled in plain JVM here so
  // the law is checked generatively and engine-independently)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hex60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private val termsGen: Gen[List[String]] =
    Gen.listOfN(200, Gen.oneOf((0 until 25).map(i => s"t$i")))

  property("CMS estimate never undercounts, for any term multiset") =
    Prop.forAll(termsGen) { terms =>
      val (d, w) = (4, 16) // narrow on purpose: collisions must occur
      val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
      terms.foreach(t => (0 until d).foreach { j =>
        val b = hex60(s"$t#$j") % w
        counters((j, b)) = counters.getOrElse((j, b), 0L) + 1
      })
      val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      exact.forall { case (t, n) =>
        val est = (0 until d).map(j => counters((j, hex60(s"$t#$j") % w))).min
        est >= n
      }
    }

  property("CMS counters are shard-merge invariant") =
    Prop.forAll(termsGen, Gen.choose(0, 200)) { (terms, cut) =>
      def matrix(ts: Seq[String]): Map[(Int, Long), Long] = {
        val m = scala.collection.mutable.Map.empty[(Int, Long), Long]
        ts.foreach(t => (0 until 4).foreach { j =>
          val b = hex60(s"$t#$j") % 16
          m((j, b)) = m.getOrElse((j, b), 0L) + 1
        })
        m.toMap
      }
      val (a, b) = terms.splitAt(cut min terms.length)
      val merged = (matrix(a).keySet ++ matrix(b).keySet).map { k =>
        k -> (matrix(a).getOrElse(k, 0L) + matrix(b).getOrElse(k, 0L))
      }.toMap
      merged == matrix(terms)
    }

  property("Bloom filter never false-negatives, for any key set") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { keys =>
      val m = graft.operators.BloomFilter.sized(keys.size.toLong)
      val bits = keys.flatMap(k => (0 until 3).map(j => hex60(s"$k@$j") % m)).toSet
      keys.forall(k => (0 until 3).forall(j => bits(hex60(s"$k@$j") % m)))
    }

  property("Bloom sized() is the minimal power of two >= 32n") =
    Prop.forAll(Gen.choose(1L, 1L << 40)) { n =>
      val m = graft.operators.BloomFilter.sized(n)
      (m & (m - 1)) == 0 && m >= 32 * n && m / 2 < 32 * n
    }

  // ---- KMV insertion law (q99's day states / q104's set algebra)

  private val hashesGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1L << 60))

  property("KMV state is arrival-order invariant, for any hash stream") =
    Prop.forAll(hashesGen) { hs =>
      def fold(xs: Seq[Long]): Seq[Long] =
        xs.foldLeft(Array.emptyLongArray)(graft.operators.KmvSketch.insert).toSeq
      fold(hs) == fold(hs.reverse) && fold(hs) == fold(scala.util.Random.shuffle(hs))
    }

  property("KMV state IS the k smallest distinct hashes") =
    Prop.forAll(hashesGen) { hs =>
      val st = hs.foldLeft(Array.emptyLongArray)(graft.operators.KmvSketch.insert)
      st.toSeq == hs.distinct.sorted.take(graft.operators.KmvSketch.K)
    }

  property("KMV closure: k-min of per-shard k-mins equals the whole's") =
    Prop.forAll(hashesGen, Gen.choose(1, 7)) { (hs, shards) =>
      def state(xs: Seq[Long]): Array[Long] =
        xs.foldLeft(Array.emptyLongArray)(graft.operators.KmvSketch.insert)
      val whole = state(hs).toSeq
      val viaShards = state(
        hs.zipWithIndex.groupBy(_._2 % shards).values
          .flatMap(sh => state(sh.map(_._1))).toSeq).toSeq
      viaShards == whole
    }

  // ---- quantile-sketch sample law (q123): bottom-k by hash is mergeable
  // and order statistics read off the merged state match the whole's

  property("quantile sketch: bottom-k of per-shard bottom-ks equals the whole's") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(0.0, 1e5))),
      Gen.choose(1, 7), Gen.choose(1, 64)) { (rows, shards, k) =>
      // (hash, value) rows; the sketch state is the k rows with the
      // smallest (hash, value) — deterministic even with hash ties
      def bottomK(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
        xs.sorted.take(k)
      val whole = bottomK(rows)
      val viaShards = bottomK(
        rows.zipWithIndex.groupBy(_._2 % shards).values
          .flatMap(sh => bottomK(sh.map(_._1))).toSeq)
      viaShards == whole
    }

  // ---- TopK insertion law (q95 batch / topkStream)

  property("TopK insert folds to sorted distinct take-k, any order") =
    Prop.forAll(Gen.listOf(Gen.choose(-1000L, 1000L)), Gen.choose(1, 50)) { (vs, k) =>
      val st = vs.foldLeft(Array.emptyLongArray)((b, v) =>
        graft.operators.TopK.insert(b, v, k))
      st.toSeq == vs.distinct.sorted.take(k)
    }

  // ---- z-order bit interleave (Sources.writeZOrdered's lattice)

  property("2-col z-order interleave is a bijection on the 16-bit lattice") =
    Prop.forAll(Gen.choose(0, 65535), Gen.choose(0, 65535)) { (x, y) =>
      def z(a: Int, b: Int): Long =
        (0 until 16).foldLeft(0L) { (acc, i) =>
          acc | (((a >> i) & 1).toLong << (2 * i)) |
            (((b >> i) & 1).toLong << (2 * i + 1))
        }
      def unz(v: Long): (Int, Int) = {
        var a = 0; var b = 0
        (0 until 16).foreach { i =>
          a |= (((v >> (2 * i)) & 1) << i).toInt
          b |= (((v >> (2 * i + 1)) & 1) << i).toInt
        }
        (a, b)
      }
      unz(z(x, y)) == ((x, y))
    }
}
