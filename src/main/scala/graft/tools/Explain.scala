package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audit: print formatted physical plans for the named queries (or a
  * default set) — used to check pushdown/broadcast/codegen per the scale
  * checklist (PushedFilters reach the scan, dims broadcast, WholeStageCodegen
  * spans are wide, no stray CartesianProduct/SortMergeJoin where a hash join
  * belongs).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q02_filter", "q06_enrich_join", "q13_argmax_argmin",
      "q22_rollup_revenue", "q25_cosine_topk", "q27p_minhash_pairs")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
