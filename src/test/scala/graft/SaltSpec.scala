package graft

import graft.operators.Salt
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {

  test("saltedAgg equals direct aggregation on a skewed key") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val salted = Salt.saltedAgg(li, Seq("l_returnflag"), buckets = 8,
      partials = Seq(sum("l_quantity").as("_q"), count(lit(1)).as("_n")),
      merge = Seq(sum("_q").as("q"), sum("_n").as("n")))
      .orderBy("l_returnflag").collect()
    assert(direct.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("saltedJoin equals plain join") {
    val li = Tables.lineitem(spark, sf0001).limit(500)
    val nation = Tables.supplier(spark, sf0001)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val plain = li.join(nation, "l_suppkey")
      .groupBy("s_nationkey").count().orderBy("s_nationkey").collect()
    val salted = Salt.saltedJoin(li, nation, "l_suppkey", buckets = 4,
      factRowId = col("l_orderkey") * 10 + col("l_linenumber"))
      .groupBy("s_nationkey").count().orderBy("s_nationkey").collect()
    assert(plain.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getInt(0), r.getLong(1))).toSeq)
  }
}
