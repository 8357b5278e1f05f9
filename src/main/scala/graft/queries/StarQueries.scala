package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.util.Det
import org.apache.spark.sql.functions._

/** Star-schema analytics over the full dimension chain (SURVEY §2.13
  * X85/X86) — the deep multi-join shapes (TPC-H Q5/Q8 families) that
  * exercise Catalyst's join ordering and broadcast planning, and the
  * first queries to touch the region/nation/supplier dimensions.
  *
  * Exact-revenue discipline: both price and discount are 2-decimal, so
  * revenue = cents(l_extendedprice) × (100 − pct(l_discount)) is an
  * exact INTEGER of cent-basis-points — no double multiply, no
  * round-tie hazard — and dollars are one final division by 1e4.
  */
object StarQueries {

  /** exact revenue in cent-basis-points: cents × (100 − discount%). */
  private val revCbp =
    (Det.cents(col("l_extendedprice")) *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
  private val revCbpSql =
    "CAST(ROUND((l_extendedprice)*100) AS BIGINT) * " +
      "(100 - CAST(ROUND((l_discount)*100) AS BIGINT))"

  // ---------------------------------------------------------------- Q121
  /** X85: local-supplier revenue (the TPC-H Q5 shape) — revenue from
    * lineitems where the supplier sits in the SAME nation as the
    * customer, for ASIA-region nations over order-years 1996–1997,
    * grouped by nation. Six tables: region → nation → customer →
    * orders → lineitem → supplier, with the correlated
    * s_nationkey = c_nationkey "local" condition that defeats naive
    * join orders.
    *
    * Plan: region and nation are broadcast literals onto customer
    * (dim chain collapses before touching a fact); orders is filtered
    * BY YEAR AT THE SCAN (predicate pushdown into parquet) before its
    * join; the one unavoidable big shuffle is lineitem ⋈ orders on the
    * order key; supplier joins as a broadcast with the local-nation
    * equality as an in-key filter. At 100 TB the same plan holds —
    * facts shuffle once on orderkey, every dimension stays broadcast.
    */
  val q121 = DeclaredQuery(
    "q121_local_supplier_revenue",
    Some(s"""SELECT n_name,
            |       CAST(SUM($revCbpSql) AS DOUBLE)/1e4 AS revenue,
            |       COUNT(*) AS n_lines
            |FROM region
            |JOIN nation   ON n_regionkey = r_regionkey
            |JOIN customer ON c_nationkey = n_nationkey
            |JOIN orders   ON o_custkey = c_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |JOIN supplier ON l_suppkey = s_suppkey
            |              AND s_nationkey = c_nationkey
            |WHERE r_name = 'ASIA'
            |  AND EXTRACT(year FROM o_orderdate) IN (1996, 1997)
            |GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
    // range predicate, not year(): a function of the column can't reach
    // the parquet scan, a half-open timestamp range pushes down (the
    // driver data's o_orderdate is timestamp[us] no-tz → TIMESTAMP_NTZ,
    // so the literals are NTZ too; semantically identical to the
    // oracle's EXTRACT(year) IN (1996, 1997))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp_ntz(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), revCbp.as("cbp"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("cbp")).cast("double") / lit(1e4)).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  // ---------------------------------------------------------------- Q122
  /** X86: market share (the TPC-H Q8 shape) — per order-year, the share
    * of total lineitem revenue supplied from the ASIA region. Share is
    * the ratio of two exact integer cent-basis-point sums, divided once
    * in DOUBLE by the identical IEEE expression on both engines.
    *
    * Plan: lineitem ⋈ orders is the one big shuffle (orderkey);
    * supplier → nation collapses to a broadcast (suppkey →
    * is-asia flag), so the per-year conditional sum is one hash-agg —
    * the numerator does NOT re-scan or re-join anything.
    */
  val q122 = DeclaredQuery(
    "q122_market_share",
    Some(s"""WITH rev AS (
            |  SELECT EXTRACT(year FROM o_orderdate) AS yr,
            |         CASE WHEN n_regionkey = 2 THEN $revCbpSql
            |              ELSE 0 END AS tgt,
            |         $revCbpSql AS tot
            |  FROM lineitem
            |  JOIN orders ON l_orderkey = o_orderkey
            |  JOIN supplier ON l_suppkey = s_suppkey
            |  JOIN nation ON s_nationkey = n_nationkey)
            |SELECT yr, CAST(SUM(tgt) AS BIGINT) AS asia_cbp,
            |       CAST(SUM(tgt) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE)
            |         AS mkt_share,
            |       CAST(SUM(tot) AS DOUBLE)/1e4 AS total_revenue
            |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val supRegion = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_regionkey"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), revCbp.as("cbp"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("yr"))
      .agg(
        sum(when(col("n_regionkey") === 2, col("cbp")).otherwise(lit(0L)))
          .as("asia_cbp"),
        sum(col("cbp")).as("tot"))
      .select(col("yr"), col("asia_cbp"),
        (col("asia_cbp").cast("double") / col("tot").cast("double"))
          .as("mkt_share"),
        (col("tot").cast("double") / lit(1e4)).as("total_revenue"))
      .orderBy("yr")
  }

  val all: Seq[DeclaredQuery] = Seq(q121, q122)
}
