package graft

import graft.queries.StarQueries

/** q121/q122 invariants: the six-table local-supplier join and the
  * market-share ratio against driver-side recounts with exact
  * cent-basis-point arithmetic. */
class StarSpec extends SparkSpec {

  private def load(name: String, cols: String*): Array[Seq[Any]] =
    spark.read.parquet(s"$sf0001/$name.parquet")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq)

  private def asLong(v: Any): Long = v match {
    case i: Int  => i.toLong
    case l: Long => l
  }

  test("q121 local-supplier revenue matches a driver-side join recount") {
    val rows = StarQueries.q121.build(spark, sf0001).collect()
    val regionAsia = load("region", "r_regionkey", "r_name")
      .filter(_(1) == "ASIA").map(r => asLong(r(0))).toSet
    val nations = load("nation", "n_nationkey", "n_name", "n_regionkey")
      .filter(r => regionAsia(asLong(r(2))))
      .map(r => asLong(r(0)) -> r(1).asInstanceOf[String]).toMap
    val custNation = load("customer", "c_custkey", "c_nationkey")
      .map(r => asLong(r(0)) -> asLong(r(1))).toMap
    val suppNation = load("supplier", "s_suppkey", "s_nationkey")
      .map(r => asLong(r(0)) -> asLong(r(1))).toMap
    val orders = load("orders", "o_orderkey", "o_custkey", "o_orderdate")
      .filter { r =>
        val y = r(2) match {
          case t: java.time.LocalDateTime => t.getYear
          case t: java.sql.Timestamp      => t.toLocalDateTime.getYear
        }
        y == 1996 || y == 1997
      }.map(r => asLong(r(0)) -> asLong(r(1))).toMap
    val want = load("lineitem", "l_orderkey", "l_suppkey",
      "l_extendedprice", "l_discount")
      .flatMap { r =>
        for {
          cust <- orders.get(asLong(r(0)))
          cNat = custNation(cust)
          nName <- nations.get(cNat)
          sNat = suppNation(asLong(r(1)))
          if sNat == cNat
        } yield {
          val cbp = math.round(r(2).asInstanceOf[Double] * 100) *
            (100L - math.round(r(3).asInstanceOf[Double] * 100))
          (nName, cbp)
        }
      }.groupBy(_._1).map { case (n, xs) =>
        n -> (xs.map(_._2).sum, xs.length.toLong)
      }
    assert(rows.nonEmpty && rows.length == want.size)
    rows.foreach { r =>
      val (cbp, n) = want(r.getString(0))
      assert(math.round(r.getDouble(1) * 10000) == cbp, s"${r.getString(0)} revenue")
      assert(r.getLong(2) == n, s"${r.getString(0)} line count")
    }
  }

  test("q122 market share: exact ratio laws and corpus-revenue conservation") {
    val rows = StarQueries.q122.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalCbp = load("lineitem", "l_extendedprice", "l_discount").map { r =>
      math.round(r(0).asInstanceOf[Double] * 100) *
        (100L - math.round(r(1).asInstanceOf[Double] * 100))
    }.sum
    // every lineitem joins exactly one order and one supplier, so the
    // per-year totals partition the corpus revenue
    assert(rows.map(r => math.round(r.getDouble(3) * 10000)).sum == totalCbp)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, "share in [0,1]")
      // share numerator/denominator consistency: share * total == asia
      val asia = r.getLong(1)
      val tot = math.round(r.getDouble(3) * 10000)
      assert(r.getDouble(2) == asia.toDouble / tot.toDouble, "IEEE ratio")
    }
  }
}
