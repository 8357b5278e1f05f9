package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Scale audit: list every declared query whose physical plan contains a
  * WindowExec with an EMPTY partition spec — the "No Partition Defined for
  * Window" single-reducer shape that is fatal at 100 TB. Run after plan
  * changes; the target state is zero rows for large-input windows (tiny
  * post-aggregate frames are reported too — judge them by input size). */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false") // keep the plan walkable
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan
        val globals = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (globals.nonEmpty) {
          bad += globals.size
          println(s"GLOBAL-WINDOW $n: ${globals.size} " +
            globals.map(_.windowExpression.map(_.sql).mkString("; ")).mkString(" | "))
        }
      } catch {
        case e: Throwable => println(s"ERR $n: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"total global windows: $bad")
    spark.stop()
  }
}
