package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) =
    ColumnShim.column(graft.expressions.NfcNormalize(ColumnShim.expression(c)))

  test("NFC composes combining sequences; already-NFC strings pass through") {
    val rows = Seq(
      "café", // e + combining acute → é
      "tẽst", // e + combining tilde → ẽ
      "café", // already composed
      "plain ascii",
      "" // empty
    ).toDF("s").select(col("s"), nfc(col("s")).as("n"), length(nfc(col("s"))).as("l"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows(0)._2 == "café" && rows(0)._3 == 4)
    assert(rows(1)._2 == "tẽst" && rows(1)._3 == 4)
    assert(rows(2)._2 == "café")
    assert(rows(3)._2 == "plain ascii")
    assert(rows(4)._2 == "")
  }

  test("expression matches java.text.Normalizer on random mixed strings") {
    val rng = new scala.util.Random(11)
    val pool = "abc ́̃éñe n".toCharArray
    val strs = Seq.fill(200)(
      (0 until rng.nextInt(12)).map(_ => pool(rng.nextInt(pool.length))).mkString)
    val got = strs.toDF("s").select(nfc(col("s"))).as[String].collect()
    strs.zip(got).foreach { case (in, out) =>
      assert(out == java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC),
        s"input ${in.map(_.toInt.toHexString)}")
    }
  }

  test("nulls propagate") {
    val out = Seq[Option[String]](Some("a"), None).toDF("s")
      .select(nfc(col("s"))).collect()
    assert(out(0).getString(0) == "a" && out(1).isNullAt(0))
  }
}
