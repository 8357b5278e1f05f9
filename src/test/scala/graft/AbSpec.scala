package graft

import graft.queries.AbQueries

/** q117/q118 invariants: the chi-square readout against a BigInt
  * driver recount, and the RFM grid's NTILE balance laws. */
class AbSpec extends SparkSpec {

  private def perUser() = {
    spark.read.parquet(s"$sf0001/events.parquet").collect()
      .map { r =>
        val es = r.get(r.fieldIndex("ts")) match {
          case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC)
          case t: java.sql.Timestamp      => t.getTime / 1000
          case l: Long                    => l / 1000000000L
        }
        (r.getLong(r.fieldIndex("user_id")), es,
          r.getString(r.fieldIndex("event_type")),
          r.getDouble(r.fieldIndex("value")))
      }.groupBy(_._1).map { case (u, xs) =>
        (u,
          xs.exists(t => t._3 == "purchase" && t._4 >= 90.0),
          xs.map(_._2).max,
          xs.length.toLong,
          xs.map(t => math.round(t._4 * 100)).sum)
      }.toSeq
  }

  test("q117 A/B readout matches a BigInt driver recount") {
    val row = AbQueries.q117.build(spark, sf0001).collect().head
    val users = perUser()
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:ab1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(h.take(15), 16) % 2 == 0) "control"
      else "treatment"
    }
    val t = users.filter(u => arm(u._1) == "treatment")
    val c = users.filter(u => arm(u._1) == "control")
    val (nT, convT) = (t.length.toLong, t.count(_._2).toLong)
    val (nC, convC) = (c.length.toLong, c.count(_._2).toLong)
    assert(row.getLong(0) == nT && row.getLong(1) == convT)
    assert(row.getLong(2) == nC && row.getLong(3) == convC)
    assert(row.getLong(4) == 1000000L * convT / nT)
    assert(row.getLong(5) == 1000000L * convC / nC)
    val diff = BigInt(convT * (nC - convC) - convC * (nT - convT))
    val chi2 = (BigInt(1000000) * (nT + nC) * diff * diff /
      (BigInt(nT) * nC * (convT + convC) * ((nT - convT) + (nC - convC)))).toLong
    assert(row.getLong(6) == chi2, "chi2 ppm")
  }

  test("q134 concentration: gini and decile share match a sorted driver recount") {
    val row = AbQueries.q134.build(spark, sf0001).collect().head
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }.toSeq
    val sorted = spend.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length.toLong
    val tot = sorted.map(BigInt(_)).sum
    val iws = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(1000000) * (2 * iws - BigInt(n + 1) * tot) /
      (BigInt(n) * tot)).toLong
    val top = sorted.zipWithIndex
      .filter { case (_, i) => 10L * (i + 1) > 9L * n }.map(t => BigInt(t._1)).sum
    assert(row.getLong(0) == n)
    assert(BigInt(math.round(row.getDouble(1) * 100)) == tot)
    assert(row.getLong(2) == gini, "gini ppm")
    assert(row.getLong(3) == (BigInt(1000000) * top / tot).toLong, "decile share")
    assert(row.getLong(2) >= 0 && row.getLong(2) <= 1000000)
    assert(row.getLong(3) >= 100000, "top decile holds at least its pro-rata share")
  }

  test("q118 RFM grid: bins balanced per NTILE law, masses conserved") {
    val rows = AbQueries.q118.build(spark, sf0001).collect()
    val users = perUser()
    val n = users.length.toLong
    assert(rows.map(_.getLong(3)).sum == n, "every user lands in one segment")
    assert(rows.map(r => math.round(r.getDouble(4) * 100)).sum ==
      users.map(_._5).sum, "value mass conserved")
    // each axis's marginal bin sizes follow NTILE(4): first n%4 bins one extra
    for (axis <- 0 to 2) {
      val marginal = rows.groupBy(_.getLong(axis))
        .map { case (b, rs) => b -> rs.map(_.getLong(3)).sum }
      assert(marginal.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
      val (q, rem) = (n / 4, n % 4)
      marginal.foreach { case (b, cnt) =>
        val want = if (b <= rem) q + 1 else q
        assert(cnt == want, s"axis $axis bin $b size $cnt != $want")
      }
    }
    // quartile monotonicity on the monetary axis: higher m_bin, higher
    // min user spend — recheck against a driver-side sort
    val sorted = users.sortBy(u => (u._5, u._1)).map(_._5)
    val (q4, rem) = (n / 4, n % 4)
    val firstBinSize = if (rem >= 1) q4 + 1 else q4
    val maxBin1 = sorted.take(firstBinSize.toInt).max
    val minBin4 = sorted.drop((n - q4).toInt).min
    assert(maxBin1 <= minBin4)
  }
}
