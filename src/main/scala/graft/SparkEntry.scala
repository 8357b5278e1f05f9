package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each declared query lives in graft.queries.* as a DeclaredQuery carrying
  * both the Spark builder and (when SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {

  private val declared: Seq[DeclaredQuery] =
    RelationalQueries.all ++ CircleQuery.all ++ EventQueries.all ++
      VectorQueries.all ++ TextQueries.all ++ TensorQueries.all ++
      SubwordQueries.all ++ ImageQueries.all ++ AudioQueries.all ++
      VideoQueries.all ++ PiiQueries.all ++ CurationQueries.all ++
      RetrievalQueries.all ++ LmQueries.all ++ RewriteQueries.all ++
      RankQueries.all ++ GraphQueries.all ++ ProfileQueries.all ++
      EntityQueries.all ++ BasketQueries.all ++ AbQueries.all ++
      TimeSeriesQueries.all ++ StarQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q06.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q23 HLL sketch) → driver records a weaker rows-only check there.
    */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
