package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.util.Det
import org.apache.spark.sql.functions._

/** Market-basket and hierarchy analytics (SURVEY §2.13 X79/X80) — the
  * association-rule and org-tree rollup shapes a BI workload runs daily.
  *
  * Determinism discipline: support/confidence/lift are ratios of exact
  * integer counts, reported as ppm by integer division (the q102/q108
  * pattern) — no floating point anywhere; the one product that can
  * outgrow int64 (lift's `1e6·supp_ab·n_orders` reaches ~2e20 at sf10)
  * is widened to DECIMAL(38,0) / HUGEINT exactly like q109's moment
  * sums, then the quotient (bounded by 1e6·n/supp) is cast back.
  */
object BasketQueries {

  // ---------------------------------------------------------------- Q115
  /** X79: brand association rules — for every ordered brand pair
    * (a < b), co-occurrence support plus confidence(a→b) and lift in
    * exact ppm. The frequent-itemset-pairs report (Agrawal & Srikant's
    * Apriori at k=2) that drives "bought together" features.
    *
    * Plan: dim join to part (broadcast — part is the small side) →
    * DISTINCT (order, brand) market basket → self-join on the order key
    * only (one shuffle; both sides are the SAME frame so the exchange
    * is reused) with a<b in the join condition — pair fan-out per order
    * is bounded by basket size squared (≤ 11 distinct brands/order in
    * this data; baskets, not corpora), NEVER a cross join across
    * orders. Per-brand supports and the order count are vocabulary-
    * sized frames broadcast back onto the 300-row pair table.
    */
  val q115 = DeclaredQuery(
    "q115_basket_rules",
    Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           |            FROM lineitem JOIN part ON l_partkey = p_partkey),
           |n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
           |s AS (SELECT b, COUNT(*) AS supp FROM ob GROUP BY 1),
           |pair AS (SELECT a.b AS brand_a, c.b AS brand_b,
           |                COUNT(*) AS supp_ab
           |         FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
           |         GROUP BY 1, 2)
           |SELECT p.brand_a, p.brand_b, p.supp_ab,
           |       (1000000 * p.supp_ab) // sa.supp AS conf_ppm,
           |       CAST((CAST(1000000 AS HUGEINT) * p.supp_ab * n.n_orders)
           |            // (CAST(sa.supp AS HUGEINT) * sb.supp) AS BIGINT)
           |         AS lift_ppm
           |FROM pair p, n
           |JOIN s sa ON p.brand_a = sa.b
           |JOIN s sb ON p.brand_b = sb.b
           |WHERE p.supp_ab >= 3
           |ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    val ob = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct()
    val nOrders = ob.agg(countDistinct(col("o")).as("n_orders"))
    val supp = ob.groupBy(col("b")).agg(count(lit(1)).as("supp"))
    val pair = ob.select(col("o"), col("b").as("brand_a"))
      .join(ob.select(col("o").as("o2"), col("b").as("brand_b")),
        col("o") === col("o2") && col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= 3)
    pair
      .join(broadcast(supp.select(col("b"), col("supp").as("supp_a"))),
        col("brand_a") === col("b")).drop("b")
      .join(broadcast(supp.select(col("b"), col("supp").as("supp_b"))),
        col("brand_b") === col("b")).drop("b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("supp_ab"),
        expr("(1000000 * supp_ab) div supp_a").as("conf_ppm"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * supp_ab * n_orders)
               | div (CAST(supp_a AS DECIMAL(38,0)) * supp_b) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("lift_ppm"))
      .orderBy("brand_a", "brand_b")
  }

  // ---------------------------------------------------------------- Q116
  /** X80: hierarchy rollup — per-user spend aggregated up a binary
    * org tree (parent(v) = v DIV 2), reporting subtree user count and
    * exact-cent subtree value for every node under 64. The BOM/org-
    * chart transitive aggregation that SQL needs a recursive CTE for.
    *
    * Plan contrast is the point: the ORACLE climbs with an actual
    * `WITH RECURSIVE` (depth = tree height); Spark needs NO iteration —
    * a node's ancestor chain is closed-form (u >> k for k = 0..bitlen),
    * so one `sequence`+`explode` (a ≤ log₂(maxUser) ≈ 21-row map-side
    * fan-out, no shuffle per level, no driver loop) followed by one
    * hash-agg computes every subtree in a single pass. Each user hits
    * each ancestor exactly once (the chain strictly decreases), so
    * COUNT(*) == COUNT(DISTINCT u) and the cheap form is used.
    */
  val q116 = DeclaredQuery(
    "q116_hierarchy_rollup",
    Some("""WITH RECURSIVE spend AS (
           |  SELECT user_id AS u,
           |         SUM(CAST(ROUND((value)*100) AS BIGINT)) AS cent
           |  FROM events GROUP BY 1),
           |climb AS (
           |  SELECT u AS node, u, cent FROM spend
           |  UNION ALL
           |  SELECT node // 2, u, cent FROM climb WHERE node > 0
           |)
           |SELECT node, COUNT(*) AS n_users,
           |       CAST(SUM(cent) AS DOUBLE)/1e2 AS subtree_value
           |FROM climb WHERE node < 64
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, d) =>
    val spend = Tables.events(s, d)
      .groupBy(col("user_id").as("u"))
      .agg(sum(Det.cents(col("value"))).as("cent"))
    spend
      .select(col("u"), col("cent"),
        explode(sequence(lit(0),
          when(col("u") === 0, lit(0))
            .otherwise(length(bin(col("u")))).cast("int"))).as("k"))
      .select(expr("shiftright(u, k)").as("node"), col("u"), col("cent"))
      .filter(col("node") < 64)
      .groupBy("node")
      .agg(count(lit(1)).as("n_users"),
        Det.unCents(sum(col("cent"))).as("subtree_value"))
      .orderBy("node")
  }

  val all: Seq[DeclaredQuery] = Seq(q115, q116)
}
