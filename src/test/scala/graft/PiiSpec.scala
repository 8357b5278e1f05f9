package graft

import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("q76 injection: Luhn gate accepts exactly the %12 docs' cards") {
    val out = queries.PiiQueries.q76.build(spark, sf0001)
      .select("doc_id", "cc_candidate", "cc_valid")
      .as[(Long, Int, Int)].collect()
    out.foreach { case (id, cand, valid) =>
      assert(cand == (if (id % 6 == 0) 1 else 0), s"doc $id candidate")
      assert(valid == (if (id % 12 == 0) 1 else 0), s"doc $id valid")
    }
  }

  test("the Luhn expression agrees with the public checksum on known cards") {
    // public test numbers (valid): Visa/Mastercard/Discover 16-digit
    val valid = Seq("4532015112830366", "5555555555554444", "6011111111111117")
    val invalid = valid.map(c => c.dropRight(1) + ((c.last - '0' + 1) % 10))
    def ref(cc: String): Boolean = { // straightforward spec-side Luhn
      val sum = cc.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      sum % 10 == 0
    }
    valid.foreach(c => assert(ref(c), s"reference rejects known-valid $c"))
    invalid.foreach(c => assert(!ref(c)))
    // drive the same strings through the query's expression path by
    // planting them as the full candidate in a 1-row frame
    val got = (valid ++ invalid).toDF("cc")
      .select(col("cc"), expr(
        (1 to 16).map { i =>
          val d = s"(ascii(substr(cc, $i, 1)) - 48)"
          if ((17 - i) % 2 == 0) s"(CASE WHEN $d*2 > 9 THEN $d*2-9 ELSE $d*2 END)" else d
        }.mkString("(", " + ", ") % 10 = 0")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    valid.foreach(c => assert(got(c), s"expression rejects $c"))
    invalid.foreach(c => assert(!got(c), s"expression accepts $c"))
  }

  test("strict IPv4 pattern rejects out-of-range octets at full-match grain") {
    val pat = "^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])([.](25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])){3}$"
    val cases = Seq(
      "0.0.0.0" -> true, "255.255.255.255" -> true, "192.168.1.10" -> true,
      "256.1.1.1" -> false, "1.2.3" -> false, "1.2.3.4.5" -> false)
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), col("s").rlike(pat).as("m"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (s, e) => assert(got(s) == e, s) }
  }
}
