package graft

import graft.operators.KmvSketch
import graft.util.Det
import org.apache.spark.sql.functions._

/** KMV distinct sketch (q23's oracle-decidable core). */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hex60 column matches pure-JVM parse of the same md5 prefix") {
    val df = (1 to 50).map(_.toString).toDF("k")
      .select(col("k"), Det.hex60(md5(col("k"))).as("hv"))
    df.collect().foreach { r =>
      val expect = java.lang.Long.parseLong(md5hex(r.getString(0)).substring(0, 15), 16)
      assert(r.getLong(1) == expect)
    }
  }

  test("fewer than K distinct values → exact count, support = count") {
    val out = (1 to 200).map(i => i % 40).toDF("v")
      .select(Det.hex60(md5(col("v").cast("string"))).as("hv"))
      .agg(KmvSketch(col("hv")).as("kmv"))
      .select(col("kmv.estimate"), col("kmv.support"))
      .head()
    assert(out.getDouble(0) == 40.0)
    assert(out.getLong(1) == 40L)
  }

  test("estimate is within KMV error bounds and partition-invariant") {
    val n = 5000
    val base = (1 to n * 3).map(i => i % n).toDF("v")
      .select(Det.hex60(md5(col("v").cast("string"))).as("hv"))
    def run(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = df.agg(KmvSketch(col("hv")).as("kmv"))
        .select(col("kmv.estimate"), col("kmv.support")).head()
      (r.getDouble(0), r.getLong(1))
    }
    val (est, support) = run(base)
    assert(support == KmvSketch.K)
    // std error ~ 1/sqrt(k-2) ≈ 12.7%; 4 sigma
    assert(math.abs(est - n) / n < 0.5, s"estimate $est too far from $n")
    // merge path: different partitioning must give the identical sketch
    assert(run(base.repartition(7)) == ((est, support)))
    assert(run(base.repartition(1)) == ((est, support)))
  }

  test("closure: re-sketching per-part k-min states equals the direct sketch") {
    // q99's pre-aggregated-store contract: k-min of a union == k-min of
    // the union of per-part k-mins (Beyer et al. SIGMOD'07), so a
    // day-keyed state table answers any window without raw rescans.
    val rows = (1 to 4000).map(i => (i % 9, i % 1300)) // (part, value)
    val df = rows.toDF("part", "v")
      .select(col("part"), Det.hex60(md5(col("v").cast("string"))).as("hv"))
    val direct = df.agg(KmvSketch(col("hv")).as("kmv"))
      .select(col("kmv.estimate"), col("kmv.support")).head()
    val viaStates = df.groupBy("part").agg(KmvSketch.state(col("hv")).as("st"))
      .select(explode(col("st")).as("hv"))
      .agg(KmvSketch(col("hv")).as("kmv"))
      .select(col("kmv.estimate"), col("kmv.support")).head()
    assert(viaStates == direct)
    // and each state is bounded by K
    val maxLen = df.groupBy("part").agg(KmvSketch.state(col("hv")).as("st"))
      .select(size(col("st")).as("n")).agg(max(col("n"))).head().getInt(0)
    assert(maxLen <= KmvSketch.K)
  }
}
