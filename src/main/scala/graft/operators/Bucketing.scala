package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table support — the "co-located joins via bucketing" lever:
  * both sides of a recurring fact-fact join written with the same bucket
  * count on the join key join WITHOUT a shuffle (each bucket pair is a
  * local sort-merge). At 100 TB this turns the nightly lineitem⋈orders
  * shuffle (the single largest exchange in the workload) into a scan-side
  * property paid once at write time.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** true when the executed plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually removed the exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
