package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2.14: a Spark-side builder plus an
  * optional DuckDB oracle SQL string the driver hash-compares against.
  *
  * Contract (see SURVEY §2.14 determinism rules):
  *   - result has an explicit ORDER BY on a unique key;
  *   - column names match between the Spark result and the oracle SQL;
  *   - doubles either derive from exact integer arithmetic (money → cents)
  *     or are produced by the *same* IEEE expression tree on both sides so
  *     they agree well inside the driver's 6-decimal rounding;
  *   - seeded randomness is `md5(concat_ws(':', key, seed))` — identical
  *     text in both engines — never `rand()`.
  */
final case class DeclaredQuery(
    name: String,
    oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)
