package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.functions._

/** Data-profiling queries (SURVEY §2.13 X70/X71) — the Deequ-style
  * expectation sweep every ingest gate runs before a corpus is admitted,
  * and per-group exact-sum regression, the feature-stats primitive.
  *
  * Both are single-scan shapes: all metrics ride one aggregate over the
  * table (conditional aggregation, no per-metric re-scan), so at 100 TB
  * the cost is the scan itself. Determinism: every reported double is
  * either a ratio of exact integer counts or derived from exact
  * integer/decimal sums by an expression tree spelled identically in
  * both engines (the q102 integer-arithmetic discipline).
  */
object ProfileQueries {

  // ---------------------------------------------------------------- Q106
  /** X70: data-quality profile of `orders` — completeness (non-null
    * fraction), distinctness (distinct/rows), numeric min/max/mean,
    * domain conformance (status ∈ {O,F,P}, priority shaped 'd-…'),
    * date bounds — one row per (column, metric).
    *
    * Plan: ONE scan → one aggregate row (conditional aggregation; the
    * multi-countDistinct compiles to Spark's expand+two-phase agg — the
    * standard exact plan; a 100 TB profile would swap countDistinct for
    * the q23 KMV state with everything else unchanged) → `stack` unpivots
    * the row into the (column, metric, value) report. Mean rides the
    * exact cent-sum ([[graft.util.Det.cents]]); all ratios divide exact
    * BIGINT counts.
    */
  val q106 = DeclaredQuery(
    "q106_quality_profile",
    Some("""WITH a AS (SELECT
           |  COUNT(*) AS cnt,
           |  COUNT(o_custkey) AS c_ck, COUNT(DISTINCT o_custkey) AS d_ck,
           |  MIN(o_custkey) AS mn_ck, MAX(o_custkey) AS mx_ck,
           |  COUNT(o_totalprice) AS c_tp,
           |  MIN(o_totalprice) AS mn_tp, MAX(o_totalprice) AS mx_tp,
           |  SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS s_tp,
           |  COUNT(o_orderstatus) AS c_os, COUNT(DISTINCT o_orderstatus) AS d_os,
           |  COUNT(*) FILTER (WHERE o_orderstatus IN ('O','F','P')) AS k_os,
           |  COUNT(o_orderpriority) AS c_op, COUNT(DISTINCT o_orderpriority) AS d_op,
           |  COUNT(*) FILTER (WHERE o_orderpriority LIKE '_-%') AS k_op,
           |  COUNT(o_orderdate) AS c_od,
           |  MIN(CAST(epoch(o_orderdate) AS BIGINT)) AS mn_od,
           |  MAX(CAST(epoch(o_orderdate) AS BIGINT)) AS mx_od
           |FROM orders)
           |SELECT col_name, metric, value FROM (
           |  SELECT '_table' AS col_name, 'rows' AS metric, CAST(cnt AS DOUBLE) AS value FROM a
           |  UNION ALL SELECT 'o_custkey', 'completeness', CAST(c_ck AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_custkey', 'distinctness', CAST(d_ck AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_custkey', 'min', CAST(mn_ck AS DOUBLE) FROM a
           |  UNION ALL SELECT 'o_custkey', 'max', CAST(mx_ck AS DOUBLE) FROM a
           |  UNION ALL SELECT 'o_totalprice', 'completeness', CAST(c_tp AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_totalprice', 'min', mn_tp FROM a
           |  UNION ALL SELECT 'o_totalprice', 'max', mx_tp FROM a
           |  UNION ALL SELECT 'o_totalprice', 'mean', CAST(s_tp AS DOUBLE)/100.0/cnt FROM a
           |  UNION ALL SELECT 'o_orderstatus', 'completeness', CAST(c_os AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderstatus', 'distinctness', CAST(d_os AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderstatus', 'conformance', CAST(k_os AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderpriority', 'completeness', CAST(c_op AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderpriority', 'distinctness', CAST(d_op AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderpriority', 'conformance', CAST(k_op AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderdate', 'completeness', CAST(c_od AS DOUBLE)/cnt FROM a
           |  UNION ALL SELECT 'o_orderdate', 'min_epoch', CAST(mn_od AS DOUBLE) FROM a
           |  UNION ALL SELECT 'o_orderdate', 'max_epoch', CAST(mx_od AS DOUBLE) FROM a
           |) ORDER BY col_name, metric""".stripMargin)) { (s, d) =>
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val a = Tables.orders(s, d).agg(
      count(lit(1)).as("cnt"),
      count(col("o_custkey")).as("c_ck"),
      countDistinct(col("o_custkey")).as("d_ck"),
      min(col("o_custkey")).as("mn_ck"), max(col("o_custkey")).as("mx_ck"),
      count(col("o_totalprice")).as("c_tp"),
      min(col("o_totalprice")).as("mn_tp"), max(col("o_totalprice")).as("mx_tp"),
      sum(graft.util.Det.cents(col("o_totalprice"))).as("s_tp"),
      count(col("o_orderstatus")).as("c_os"),
      countDistinct(col("o_orderstatus")).as("d_os"),
      count(when(col("o_orderstatus").isin("O", "F", "P"), 1)).as("k_os"),
      count(col("o_orderpriority")).as("c_op"),
      countDistinct(col("o_orderpriority")).as("d_op"),
      count(when(col("o_orderpriority").like("_-%"), 1)).as("k_op"),
      count(col("o_orderdate")).as("c_od"),
      min(unix_timestamp(col("o_orderdate"))).as("mn_od"),
      max(unix_timestamp(col("o_orderdate"))).as("mx_od"))
    val r = a.select(
      dbl(col("cnt")).as("rows"),
      (dbl(col("c_ck")) / col("cnt")).as("ck_comp"),
      (dbl(col("d_ck")) / col("cnt")).as("ck_dist"),
      dbl(col("mn_ck")).as("ck_min"), dbl(col("mx_ck")).as("ck_max"),
      (dbl(col("c_tp")) / col("cnt")).as("tp_comp"),
      col("mn_tp"), col("mx_tp"),
      (dbl(col("s_tp")) / 100.0 / col("cnt")).as("tp_mean"),
      (dbl(col("c_os")) / col("cnt")).as("os_comp"),
      (dbl(col("d_os")) / col("cnt")).as("os_dist"),
      (dbl(col("k_os")) / col("cnt")).as("os_conf"),
      (dbl(col("c_op")) / col("cnt")).as("op_comp"),
      (dbl(col("d_op")) / col("cnt")).as("op_dist"),
      (dbl(col("k_op")) / col("cnt")).as("op_conf"),
      (dbl(col("c_od")) / col("cnt")).as("od_comp"),
      dbl(col("mn_od")).as("od_min"), dbl(col("mx_od")).as("od_max"))
    r.select(expr(
      """stack(18,
        |  '_table','rows',rows,
        |  'o_custkey','completeness',ck_comp,
        |  'o_custkey','distinctness',ck_dist,
        |  'o_custkey','min',ck_min,
        |  'o_custkey','max',ck_max,
        |  'o_totalprice','completeness',tp_comp,
        |  'o_totalprice','min',mn_tp,
        |  'o_totalprice','max',mx_tp,
        |  'o_totalprice','mean',tp_mean,
        |  'o_orderstatus','completeness',os_comp,
        |  'o_orderstatus','distinctness',os_dist,
        |  'o_orderstatus','conformance',os_conf,
        |  'o_orderpriority','completeness',op_comp,
        |  'o_orderpriority','distinctness',op_dist,
        |  'o_orderpriority','conformance',op_conf,
        |  'o_orderdate','completeness',od_comp,
        |  'o_orderdate','min_epoch',od_min,
        |  'o_orderdate','max_epoch',od_max
        |) AS (col_name, metric, value)""".stripMargin))
      .orderBy("col_name", "metric")
  }

  // ---------------------------------------------------------------- Q109
  /** X71: per-group least-squares fit + Pearson correlation of
    * (l_quantity → l_extendedprice cents), grouped by return flag — the
    * per-segment feature-stats sweep behind drift monitors and quick
    * model sanity checks.
    *
    * Determinism: doubles summed across partitions drift with order, so
    * the five moment sums run over exact integers (quantity as BIGINT,
    * price as cents) widened to DECIMAL(38,0) on the Spark side /
    * HUGEINT in DuckDB — order-free exact sums (p² reaches ~1e14/row;
    * an int64 sum would overflow near sf1). The final corr/slope then
    * combine the exact moments in DOUBLE via the identical IEEE
    * expression tree in both engines, so the emitted doubles are
    * bit-equal even where cancellation loses precision.
    *
    * Plan: one scan → one map-side-combinable hash-agg (5 sums + count,
    * all codegen) → 3-row result. The scan is the cost at any scale.
    */
  val q109 = DeclaredQuery(
    "q109_grouped_regression",
    Some("""WITH b AS (SELECT l_returnflag AS flag,
           |    CAST(ROUND(l_quantity) AS BIGINT) AS q,
           |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p
           |  FROM lineitem),
           |s AS (SELECT flag, COUNT(*) AS n,
           |    SUM(CAST(q AS HUGEINT)) AS sx, SUM(CAST(p AS HUGEINT)) AS sy,
           |    SUM(CAST(q*p AS HUGEINT)) AS sxy,
           |    SUM(CAST(q*q AS HUGEINT)) AS sxx,
           |    SUM(CAST(p*p AS HUGEINT)) AS syy
           |  FROM b GROUP BY flag)
           |SELECT flag, n,
           |  CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) = 0
           |         OR (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) = 0
           |       THEN NULL ELSE
           |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (SQRT(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           |     * SQRT(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
           |  END AS corr_qty_price,
           |  CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) = 0
           |       THEN NULL ELSE
           |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           |  END AS slope_cents_per_qty
           |FROM s ORDER BY flag""".stripMargin)) { (s, d) =>
    val b = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      round(col("l_quantity"), 0).cast("long").as("q"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("p"))
    val dec = "decimal(38,0)"
    val m = b.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum(col("q").cast(dec)).as("sx"), sum(col("p").cast(dec)).as("sy"),
      sum((col("q") * col("p")).cast(dec)).as("sxy"),
      sum((col("q") * col("q")).cast(dec)).as("sxx"),
      sum((col("p") * col("p")).cast(dec)).as("syy"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val num = dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val denx = dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val deny = dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))
    // Degenerate groups (n=1 or constant x/y — the star leg's 1-row 'X'
    // flag) have zero variance: corr/slope are undefined → NULL. The
    // guard is load-bearing under ANSI, where Spark's Divide throws
    // DIVIDE_BY_ZERO even for DOUBLE operands; the zero test is the
    // SAME IEEE expression in both engines so the NULL decisions match
    // bit-for-bit (the determinism doctrine above).
    m.select(col("flag"), col("n"),
      when(denx === 0.0 || deny === 0.0, lit(null).cast("double"))
        .otherwise(num / (sqrt(denx) * sqrt(deny))).as("corr_qty_price"),
      when(denx === 0.0, lit(null).cast("double"))
        .otherwise(num / denx).as("slope_cents_per_qty"))
      .orderBy("flag")
  }

  /** one relationship row of the q124 report: child rows, distinct FK
    * values, and orphans (child rows with no parent). No forced
    * broadcast: AQE broadcasts dim-sized parents on its own, and a
    * fact-sized parent (orders) must stay a shuffle join at scale — a
    * broadcast() hint here would pin the wrong plan.
    *
    * NULL-FK semantics (NULLS.md pin 4): a NULL FK references nothing
    * and is NOT an orphan — dbt's `relationships` test semantics. The
    * anti-join would otherwise count NULL-keyed rows (they never match),
    * so the orphan arm filters `fk IS NOT NULL` first; completeness is
    * q106's metric, not this one's. */
  private[graft] def refCheck(name: String,
                              child: org.apache.spark.sql.DataFrame,
                              fk: String,
                              parent: org.apache.spark.sql.DataFrame,
                              pk: String): org.apache.spark.sql.DataFrame = {
    val counts = child.agg(count(lit(1)).as("child_rows"),
      countDistinct(col(fk)).as("distinct_fk"))
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    counts.crossJoin(orphans)
      .select(lit(name).as("relationship"), col("child_rows"),
        col("distinct_fk"), col("orphans"))
  }

  // ---------------------------------------------------------------- Q124
  /** X88: referential-integrity audit — the cross-table half of the DQ
    * gate (q106 profiles one table; this checks the FOREIGN KEYS between
    * them): for each declared relationship, the child row count, the
    * distinct FK value count, and the ORPHANS (child rows whose parent
    * is missing — the dbt `relationships` test). Healthy data reports
    * zero orphans; the count being exactly zero is what the gate
    * asserts before admitting a batch.
    *
    * Plan: each relationship is one LEFT ANTI join (Spark's dedicated
    * no-match operator — nothing materializes the match) plus one
    * hash-agg; dimensions broadcast, the two fact-sized checks shuffle
    * the fact once on its FK. At 100 TB the anti-join against a large
    * parent takes a bloom pre-filter (q82's operator) before the
    * shuffle — documented, not needed at bench scales. */
  val q124 = DeclaredQuery(
    "q124_ref_integrity",
    Some("""SELECT * FROM (
           |  SELECT 'lineitem.l_orderkey -> orders' AS relationship,
           |         (SELECT COUNT(*) FROM lineitem) AS child_rows,
           |         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)
           |           AS distinct_fk,
           |         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
           |            ON l.l_orderkey = o.o_orderkey
           |          WHERE l.l_orderkey IS NOT NULL
           |            AND o.o_orderkey IS NULL) AS orphans
           |  UNION ALL
           |  SELECT 'lineitem.l_partkey -> part',
           |         (SELECT COUNT(*) FROM lineitem),
           |         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
           |         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
           |            ON l.l_partkey = p.p_partkey
           |          WHERE l.l_partkey IS NOT NULL
           |            AND p.p_partkey IS NULL)
           |  UNION ALL
           |  SELECT 'lineitem.l_suppkey -> supplier',
           |         (SELECT COUNT(*) FROM lineitem),
           |         (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
           |         (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
           |            ON l.l_suppkey = s.s_suppkey
           |          WHERE l.l_suppkey IS NOT NULL
           |            AND s.s_suppkey IS NULL)
           |  UNION ALL
           |  SELECT 'orders.o_custkey -> customer',
           |         (SELECT COUNT(*) FROM orders),
           |         (SELECT COUNT(DISTINCT o_custkey) FROM orders),
           |         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
           |            ON o.o_custkey = c.c_custkey
           |          WHERE o.o_custkey IS NOT NULL
           |            AND c.c_custkey IS NULL)
           |  UNION ALL
           |  SELECT 'customer.c_nationkey -> nation',
           |         (SELECT COUNT(*) FROM customer),
           |         (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
           |         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
           |            ON c.c_nationkey = n.n_nationkey
           |          WHERE c.c_nationkey IS NOT NULL
           |            AND n.n_nationkey IS NULL)
           |) ORDER BY 1""".stripMargin)) { (s, d) =>
    val li = Tables.lineitem(s, d)
    Seq(
      refCheck("lineitem.l_orderkey -> orders", li, "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      refCheck("lineitem.l_partkey -> part", li, "l_partkey",
        Tables.part(s, d), "p_partkey"),
      refCheck("lineitem.l_suppkey -> supplier", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      refCheck("orders.o_custkey -> customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      refCheck("customer.c_nationkey -> nation", Tables.customer(s, d),
        "c_nationkey", Tables.nation(s, d), "n_nationkey"))
      .reduce(_ unionByName _)
      .orderBy("relationship")
  }

  val all: Seq[DeclaredQuery] = Seq(q106, q109, q124)
}
