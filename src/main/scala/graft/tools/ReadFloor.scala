package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe for the per-query fixed floor: how much of DataFrame
  * construction cost is parquet schema inference (a footer read per
  * `spark.read.parquet` call) vs planning. Informs the Tables schema
  * cache (r18). */
object ReadFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String, n: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"[floor] $label%-38s ${(System.nanoTime() - t0) / 1e9 / n}%8.4f s/op x$n")
    }
    val p = s"$sfDir/lineitem.parquet"
    t("read.parquet (infer) construct", 3)(spark.read.parquet(p))
    t("read.parquet (infer) construct", 20)(spark.read.parquet(p))
    val schema = spark.read.parquet(p).schema
    t("read.schema(...).parquet construct", 20)(spark.read.schema(schema).parquet(p))
    t("infer + count", 10)(spark.read.parquet(p).selectExpr("l_orderkey").limit(1).count())
    t("schema + count", 10)(spark.read.schema(schema).parquet(p).selectExpr("l_orderkey").limit(1).count())
    spark.stop()
  }
}
