package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("same-bucket join runs without a shuffle exchange") {
    // idempotence: the warehouse dir outlives the in-memory catalog across
    // JVM runs — drop both the table entries and their locations
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", 4)

    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    val agg = joined.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(Bucketing.isShuffleFree(agg),
      s"bucketed join+agg must not shuffle:\n${agg.queryExecution.executedPlan}")

    // same result as the shuffled plan
    val expected = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .orderBy("l_orderkey").collect()
    assert(agg.orderBy("l_orderkey").collect().toSeq == expected.toSeq)
  }
}
