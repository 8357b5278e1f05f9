package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Bucket-occupancy audit for the sign-LSH ANN path (q35): measures how the
  * plane count controls bucket sizes at a given corpus scale, so the
  * 100 TB sizing rule (buckets ≈ corpus / expected-candidates) is measured
  * rather than asserted. The in-bucket exact-cosine cost is Σ n·(n−1)/2 per
  * bucket, so `max_bucket` and `pairs` are the scale numbers that matter:
  * the shuffle is bounded by the largest bucket and the compare work by the
  * pair count.
  *
  * Usage: runMain graft.tools.LshAudit <sfDir> [planes,planes,...]
  * e.g.   runMain graft.tools.LshAudit testdata_gen/sf1 8,12,16
  * Prints one JSON line per plane count.
  */
object LshAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planeCounts = args.lift(1).getOrElse("8,12,16").split(",").map(_.trim.toInt)
    val spark = graft.Session.local(appName = "graft-lsh-audit")
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .persist()
    val total = e.count()
    planeCounts.foreach { planes =>
      val buckets = e
        .withColumn("bucket", graft.queries.VectorQueries.lshBucket(col("v"), planes))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val stats = buckets.agg(
        count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        expr("percentile_approx(n, 0.99)").as("p99_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs")).head()
      println(s"""{"metric":"lsh_occupancy","planes":$planes,"vectors":$total,""" +
        s""""n_buckets":${stats.getLong(0)},"max_bucket":${stats.getLong(1)},""" +
        s""""p99_bucket":${stats.getLong(2)},"pairs":${stats.getDouble(3).toLong},"sf":"$sfDir"}""")
    }
    e.unpersist()
    spark.stop()
  }
}
