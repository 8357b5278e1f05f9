package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.Row

/** q77 decontamination and q78 mixture sampling vs brute-force JVM
  * references over the sf0.001 corpus (500 docs — exhaustive is cheap). */
class CurationSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q77 matches an exhaustive 13-gram contamination check") {
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 13) Set.empty
      else (0 to w.length - 13).map(i => w.slice(i, i + 13).mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 % 37 == 0).map { case (id, t, _) => id -> grams(t) }
    val benchAll = bench.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val expect = docs.filter(_._1 % 37 != 0).flatMap { case (id, t, _) =>
      val g = grams(t)
      val shared = g.filter(benchAll.contains)
      if (shared.isEmpty) None
      else Some(Row(id, g.size.toLong, shared.size.toLong,
        shared.flatMap(benchAll).size.toLong,
        shared.size.toDouble / g.size.toDouble))
    }.sortBy(_.getLong(0))

    val got = CurationQueries.q77.build(spark, sf0001).collect().toSeq
    assert(got.nonEmpty, "contamination must fire on the near-dup corpus")
    assert(got.map(_.getLong(0)) == expect.map(_.getLong(0)))
    assert(got == expect)
  }

  test("q78 matches an exhaustive seeded quota-sampling check") {
    val m = docs.size * 3 / 4
    val byLang = docs.groupBy(_._3)
    val rates = byLang.map { case (l, ds) =>
      l -> math.min(1.0, 0.2 * m / ds.size)
    }
    val sampledExpect = byLang.map { case (l, ds) =>
      l -> ds.count { case (id, _, _) =>
        val hv = java.lang.Long.parseLong(md5hex(s"$id:q78").substring(0, 15), 16)
        hv.toDouble / (1L << 60).toDouble < rates(l)
      }.toLong
    }
    val totalSampled = sampledExpect.values.sum.toDouble

    val got = CurationQueries.q78.build(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSeq == got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(1) == byLang(lang).size.toLong)
      assert(r.getDouble(2) == rates(lang))
      assert(r.getLong(3) == sampledExpect(lang))
      assert(r.getDouble(4) == sampledExpect(lang) / totalSampled)
      assert(r.getLong(3) <= r.getLong(1))
    }
    // the over-represented language is down-sampled; minorities keep all
    val rateOf = got.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rateOf("en") < 1.0)
    assert(rateOf.values.exists(_ == 1.0))
  }

  test("q131 diversity: Simpson bounds hold and one lang recounts exactly") {
    val rows = graft.queries.CurationQueries.q131.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      val dom = r.getLong(3)
      assert(k >= 1 && n >= k)
      // Simpson index lies in [1/k, 1]; effective count in [1, k]
      assert(dom >= 1000000L / k - 1 && dom <= 1000000L,
        s"${r.getString(0)} dominance out of range")
      assert(r.getDouble(4) >= 1.0 - 1e-9 && r.getDouble(4) <= k + 1e-9)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lang0 = rows.head.getString(0)
    val counts = docs.filter(_._1 == lang0).groupBy(_._2)
      .map(_._2.length.toLong).toSeq
    val (total, sq) = (counts.sum, counts.map(c => c * c).sum)
    assert(rows.head.getLong(1) == total)
    assert(rows.head.getLong(2) == counts.length.toLong)
    assert(rows.head.getLong(3) ==
      (BigInt(1000000) * sq / (BigInt(total) * total)).toLong)
    assert(rows.head.getDouble(4) == total.toDouble * total / sq)
  }
}
