package graft

import graft.queries.TimeSeriesQueries

/** q119/q120 invariants: the dense-grid forecast errors against a
  * driver recount, and the clamped-balance reflection identity against
  * the literal recurrence. */
class TimeSeriesSpec extends SparkSpec {

  private def events() =
    spark.read.parquet(s"$sf0001/events.parquet").collect().map { r =>
      val es = r.get(r.fieldIndex("ts")) match {
        case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC)
        case t: java.sql.Timestamp      => t.getTime / 1000
        case l: Long                    => l / 1000000000L
      }
      (r.getLong(r.fieldIndex("user_id")), es,
        r.getLong(r.fieldIndex("event_id")),
        r.getString(r.fieldIndex("event_type")),
        math.round(r.getDouble(r.fieldIndex("value")) * 100))
    }

  test("q119 seasonal-naive errors match a dense-grid driver recount") {
    val rows = TimeSeriesQueries.q119.build(spark, sf0001).collect()
    val ev = events()
    val h0 = ev.map(_._2 / 3600).min
    val h1 = ev.map(_._2 / 3600).max
    rows.foreach { r =>
      val tpe = r.getString(0)
      val byHour = ev.filter(_._4 == tpe).groupBy(_._2 / 3600)
        .map { case (h, xs) => h -> xs.length.toLong }
      val errs = ((h0 + 168) to h1).map { h =>
        byHour.getOrElse(h, 0L) - byHour.getOrElse(h - 168, 0L)
      }
      assert(r.getLong(1) == errs.length.toLong, s"$tpe n_hours")
      assert(r.getLong(2) == errs.map(math.abs).sum, s"$tpe abs err")
      assert(r.getLong(3) == errs.sum, s"$tpe bias")
      assert(r.getLong(4) == 1000000L * errs.map(math.abs).sum / errs.length)
    }
    // zero-count hours are IN the grid: every type spans the same hours
    assert(rows.map(_.getLong(1)).distinct.length == 1)
  }

  test("q127 twap: weighted sum matches a driver recount; held values outweigh brief ones") {
    val rows = TimeSeriesQueries.q127.build(spark, sf0001).collect()
    val byUser = events().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val series = byUser(r.getLong(0)).sortBy(t => (t._2, t._3))
      val gaps = series.sliding(2).collect {
        case Array(a, b) => (a._5, b._2 - a._2)
      }.toSeq
      val span = gaps.map(_._2).sum
      val wsum = gaps.map { case (c, g) => BigInt(c) * g }.sum
      assert(r.getLong(1) == span, s"user ${r.getLong(0)} span")
      assert(r.getLong(2) == (wsum * 100 / span).toLong, s"user ${r.getLong(0)} twap")
    }
  }

  test("q128 concurrency: sweep max matches a brute-force per-second check") {
    val rows = TimeSeriesQueries.q128.build(spark, sf0001).collect()
    val iv = events().map(t => (t._2, t._2 + 1800))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (day, want) = (r.getLong(0), r.getLong(1))
      val (d0, d1) = (day * 86400, (day + 1) * 86400)
      // brute force: concurrency at each interval boundary inside the day
      val active = iv.filter(i => i._1 < d1 && i._2 > d0)
      val checkpoints = active.flatMap(i => Seq(i._1, i._2))
        .filter(t => t >= d0 && t < d1).distinct
      val brute = checkpoints.map(t =>
        active.count(i => i._1 <= t && t < i._2)).max
      assert(want == brute, s"day $day: sweep $want vs brute $brute")
      assert(r.getLong(2) == active.length.toLong, s"day $day n_active")
    }
  }

  test("q120 closed form equals the clamped recurrence for every user") {
    val rows = TimeSeriesQueries.q120.build(spark, sf0001).collect()
    val ledgers = events()
      .filter(t => t._4 == "purchase" || t._4 == "click")
      .groupBy(_._1)
    assert(rows.length == ledgers.size)
    rows.foreach { r =>
      val series = ledgers(r.getLong(0)).sortBy(t => (t._2, t._3))
      var bal = 0L; var peak = 0L
      series.foreach { t =>
        val delta = if (t._4 == "purchase") t._5 else -t._5
        bal = math.max(0L, bal + delta)
        peak = math.max(peak, bal)
      }
      assert(math.round(r.getDouble(1) * 100) == bal, s"user ${r.getLong(0)} final")
      assert(math.round(r.getDouble(2) * 100) == peak, s"user ${r.getLong(0)} peak")
    }
  }
}
