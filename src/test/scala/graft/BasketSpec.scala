package graft

import graft.queries.BasketQueries

/** q115/q116 invariants the oracle hash can't express: association-rule
  * bounds against a driver-side basket recount, and the tree algebra of
  * the hierarchy rollup (parent = child subtrees + own spend; the root
  * carries the whole corpus mass). */
class BasketSpec extends SparkSpec {

  test("q115 rules: supports and ppm ratios match a driver-side basket recount") {
    val rows = BasketQueries.q115.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = li.map { case (o, p) => (o, brandOf(p)) }.distinct
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val supp = baskets.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val pairSupp = baskets.groupBy(_._1).values.flatMap { items =>
      val bs = items.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val sab = r.getLong(2)
      assert(a < b)
      assert(sab == pairSupp((a, b)), s"supp($a,$b)")
      assert(sab <= math.min(supp(a), supp(b)), "support monotonicity")
      assert(r.getLong(3) == 1000000L * sab / supp(a), "conf ppm")
      val lift = (BigInt(1000000) * sab * nOrders / (BigInt(supp(a)) * supp(b))).toLong
      assert(r.getLong(4) == lift, "lift ppm")
      assert(r.getLong(3) <= 1000000L, "confidence <= 1")
    }
    // completeness: every pair meeting the threshold is reported
    assert(rows.length == pairSupp.count(_._2 >= 3))
  }

  test("q116 rollup: parent = children + own spend; root carries total mass") {
    val rows = BasketQueries.q116.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        math.round(r.getDouble(2) * 100))).toMap
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val ownCent = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sum }
    val users = ownCent.keySet
    // root subtree == whole corpus (every chain ends at 0)
    assert(rows(0L)._2 == ev.map(_._2).sum, "root mass")
    assert(rows(0L)._1 == users.size.toLong, "root user count")
    // tree algebra for interior nodes (children of n are 2n and 2n+1;
    // node 0 is its own parent, so its only child is 1)
    for (n <- 1L to 31L if rows.contains(n)) {
      val (cnt, cent) = rows(n)
      val childCnt = Seq(2 * n, 2 * n + 1).flatMap(rows.get).map(_._1).sum +
        (if (users.contains(n)) 1L else 0L)
      val childCent = Seq(2 * n, 2 * n + 1).flatMap(rows.get).map(_._2).sum +
        ownCent.getOrElse(n, 0L)
      assert(cnt == childCnt, s"node $n user count")
      assert(cent == childCent, s"node $n value")
    }
  }
}
