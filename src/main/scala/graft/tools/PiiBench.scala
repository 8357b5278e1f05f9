package graft.tools

import org.apache.spark.sql.functions._

/** PII scrub throughput — q73 (email+phone) and q76 (IPv4+SSN+Luhn card)
  * are pure per-row projections, so Bench's `.count()` lets Catalyst
  * prune the regex/checksum work away and times an empty scan. This
  * forces full evaluation by folding every output column into one
  * xxhash64 aggregate (nothing prunable), and reports docs/sec.
  *
  * Usage: runMain graft.tools.PiiBench [sfDir]
  */
object PiiBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local(appName = "graft-pii-bench")
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    def rate(name: String, df: org.apache.spark.sql.DataFrame): Double = {
      // 32-bit murmur summed as long: can't overflow ANSI Long at any
      // realistic row count (xxhash64's full-range longs can)
      val forced = df.agg(sum(hash(df.columns.map(col): _*).cast("long")))
      forced.head() // warmup (codegen + file index)
      val t0 = System.nanoTime()
      forced.head()
      nDocs / ((System.nanoTime() - t0) / 1e9)
    }
    val r73 = rate("q73", graft.SparkEntry.queries("q73_pii_scrub")(spark, sfDir))
    val r76 = rate("q76", graft.SparkEntry.queries("q76_pii_extended")(spark, sfDir))
    println(f"""{"metric":"pii_scrub","docs":$nDocs%d,"q73_docs_per_sec":$r73%.0f,"q76_docs_per_sec":$r76%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
