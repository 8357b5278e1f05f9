package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scans stay declarative (`spark.read.parquet` + downstream select/filter)
  * so Catalyst pushes predicates and prunes columns into the parquet reader
  * — at 100 TB the scan dominates, and a scan that reads all columns for a
  * 2-column projection is wrong (check `.explain`: PushedFilters/ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet`'s `ts` physical type has varied across driver data
    * generations — normalize every variant to a session-UTC TIMESTAMP so
    * downstream epoch arithmetic (`cast(double)`, window/session ops) is
    * generation-independent:
    *
    *  - TIMESTAMP(NANOS): only readable via the nanos-as-long legacy mode;
    *    convert with exact integer division (a double division would lose
    *    precision at 1e18 ns magnitudes). Truncation toward zero matches
    *    DuckDB's view of the same instants for post-1970 data.
    *  - timestamp[us] WITHOUT timezone: Spark 4 infers TIMESTAMP_NTZ, which
    *    rejects `cast(double)`; cast to TIMESTAMP — under the engine's
    *    mandated UTC session timezone (Session.tune/Verify/Bench/specs)
    *    this reads the naive value as the same UTC instant DuckDB sees.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the TIMESTAMP_NTZ→TIMESTAMP cast below reads naive micros under the
    // SESSION timezone: every engine entry point (Session.tune, Verify,
    // Bench, specs) pins it to UTC at session construction. A reader must
    // not mutate session config behind the user's back, so only WARN when
    // an entry point forgot the pin — shifted instants would otherwise be
    // silent.
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC")
      System.err.println(
        "[graft] WARNING: events() read under non-UTC session timezone " +
          s"'${spark.conf.get("spark.sql.session.timeZone")}' — TIMESTAMP_NTZ " +
          "instants will shift vs the engine's UTC contract; set " +
          "spark.sql.session.timeZone=UTC at session construction")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
}
