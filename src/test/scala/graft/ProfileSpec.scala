package graft

import graft.queries.{EventQueries, GraphQueries, ProfileQueries}

/** q106–q109 invariants the oracle hash can't express: profile-metric
  * laws, SCD2 interval algebra, a brute-force triangle recount, and the
  * exact-moment correlation against a direct double computation. */
class ProfileSpec extends SparkSpec {

  test("q106 profile: metric laws hold on generated orders") {
    val rows = ProfileQueries.q106.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 18)
    val n = rows(("_table", "rows"))
    assert(n > 0)
    // ratios are fractions of the row count
    for (((c, m), v) <- rows if Set("completeness", "distinctness", "conformance")(m))
      assert(v >= 0.0 && v <= 1.0, s"$c/$m out of [0,1]: $v")
    // generated data has no nulls
    assert(rows(("o_custkey", "completeness")) == 1.0)
    assert(rows(("o_orderdate", "completeness")) == 1.0)
    // bounds are ordered; mean sits inside them
    assert(rows(("o_custkey", "min")) <= rows(("o_custkey", "max")))
    assert(rows(("o_totalprice", "min")) <= rows(("o_totalprice", "mean")))
    assert(rows(("o_totalprice", "mean")) <= rows(("o_totalprice", "max")))
    assert(rows(("o_orderdate", "min_epoch")) <= rows(("o_orderdate", "max_epoch")))
    // status has few domain values: distinctness ≤ 3/n
    assert(rows(("o_orderstatus", "distinctness")) <= 3.0 / n + 1e-12)
  }

  test("q107 scd2: versions are contiguous, intervals chain, one current row per user") {
    val rows = EventQueries.q107.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"user $u versions not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval chain: valid_to of v == valid_from of v+1
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $u: interval break at version ${a.getInt(1)}")
          // a version only opens when the attribute actually changed
          assert(a.getString(2) != b.getString(2),
            s"user $u: consecutive versions share attr ${a.getString(2)}")
        case _ => ()
      }
      // exactly the last version is current (null valid_to)
      assert(sorted.count(_.getInt(5) == 1) == 1)
      assert(sorted.last.getInt(5) == 1 && sorted.last.isNullAt(4))
    }
  }

  test("q108 triangles: degree-oriented count equals a brute-force recount") {
    val row = GraphQueries.q108.build(spark, sf0001).collect().head
    val n = 2000L
    val edges = (0L until n).flatMap { v =>
      Seq((v, (v * 31 + 7) % n), (v, (v * 97 + 3) % n), (v, (v * 233 + 11) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tri = edges.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b) // a<b<c once per triangle
    }.sum
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getLong(0) == edges.length.toLong, "edge count")
    assert(row.getLong(1) == wedges, "wedge count")
    assert(row.getLong(2) == tri.toLong, s"triangle count: got ${row.getLong(2)}, want $tri")
    assert(row.getLong(3) == 3000000L * tri / wedges, "closure ppm")
  }

  test("q109 regression: exact-moment corr matches a direct computation") {
    val rows = ProfileQueries.q109.build(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1)).toDouble,
        math.round(r.getDouble(2) * 100).toDouble))
    assert(rows.map(_.getLong(1)).sum == li.length.toLong)
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => t._3 * t._3).sum
      val corr = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(r.getDouble(2) - corr) < 1e-9, s"corr ${r.getString(0)}")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(3) - slope) < math.abs(slope) * 1e-9 + 1e-9)
    }
  }
}
