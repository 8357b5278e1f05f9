package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.operators.EnclosingCircle
import org.apache.spark.sql.functions._

/** Q15 — A11/A12: smallest enclosing circle of the per-group point cloud
  * (`transforms/utils.py:129-134`: gt_center/gt_size from label pixels).
  * Points are (l_partkey mod 97, l_suppkey mod 89) per return flag.
  *
  * The Spark side is the Welzl aggregate ([[EnclosingCircle]]). The oracle
  * replays it by CANDIDATE ENUMERATION, SQL-expressible because the MEC is
  * determined by ≤3 support points that are convex-hull vertices:
  *
  *  - a hull vertex is necessarily BOTH a column extreme (min/max y for
  *    its x — otherwise it is a strict convex combination of the points
  *    above and below it) AND a row extreme (min/max x for its y); the
  *    intersection of the two extreme sets is a tiny superset of the hull
  *    (4–6 points per group on this lattice, vs ≤8633 distinct points);
  *  - candidates = all diameter circles of pairs + all circumcircles of
  *    non-degenerate triples from that set;
  *  - a candidate is valid iff it covers every COLUMN EXTREME (a circle is
  *    convex, so covering a column's endpoints covers its segment — and
  *    hence every point); the MEC is the min-radius valid candidate.
  *
  * FP parity: both engines compute in doubles and agree to ~1e-12; the
  * gate rounds doubles to 6 decimals. The 1e-9 validity slack absorbs
  * representation error in the true candidate without admitting smaller
  * false ones at the 1e-6 grain.
  */
object CircleQuery {

  private val oracle =
    """WITH pts AS (SELECT DISTINCT l_returnflag AS flag,
      |                    CAST(l_partkey % 97 AS DOUBLE) AS x,
      |                    CAST(l_suppkey % 89 AS DOUBLE) AS y FROM lineitem),
      |cnt AS (SELECT l_returnflag AS flag, COUNT(*) AS n_points FROM lineitem GROUP BY 1),
      |colext AS (SELECT flag, x, MIN(y) AS y FROM pts GROUP BY flag, x
      |           UNION SELECT flag, x, MAX(y) FROM pts GROUP BY flag, x),
      |rowext AS (SELECT flag, y, MIN(x) AS x FROM pts GROUP BY flag, y
      |           UNION SELECT flag, y, MAX(x) FROM pts GROUP BY flag, y),
      |hullc AS (SELECT flag, x, y FROM colext INTERSECT SELECT flag, x, y FROM rowext),
      |pairs AS (
      |  SELECT a.flag, (a.x+b.x)/2 AS cx, (a.y+b.y)/2 AS cy,
      |         sqrt((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y))/2 AS r
      |  FROM hullc a JOIN hullc b ON a.flag=b.flag AND (a.x<b.x OR (a.x=b.x AND a.y<b.y))),
      |tri0 AS (
      |  SELECT a.flag, a.x AS ax, a.y AS ay,
      |    ((a.x*a.x+a.y*a.y)*(b.y-c.y)+(b.x*b.x+b.y*b.y)*(c.y-a.y)+(c.x*c.x+c.y*c.y)*(a.y-b.y))
      |      / (2*(a.x*(b.y-c.y)+b.x*(c.y-a.y)+c.x*(a.y-b.y))) AS cx,
      |    ((a.x*a.x+a.y*a.y)*(c.x-b.x)+(b.x*b.x+b.y*b.y)*(a.x-c.x)+(c.x*c.x+c.y*c.y)*(b.x-a.x))
      |      / (2*(a.x*(b.y-c.y)+b.x*(c.y-a.y)+c.x*(a.y-b.y))) AS cy
      |  FROM hullc a JOIN hullc b ON a.flag=b.flag JOIN hullc c ON b.flag=c.flag
      |  WHERE (a.x<b.x OR (a.x=b.x AND a.y<b.y)) AND (b.x<c.x OR (b.x=c.x AND b.y<c.y))
      |    AND (a.x*(b.y-c.y)+b.x*(c.y-a.y)+c.x*(a.y-b.y)) <> 0),
      |triples AS (
      |  SELECT flag, cx, cy, sqrt((ax-cx)*(ax-cx)+(ay-cy)*(ay-cy)) AS r FROM tri0),
      |cand AS (SELECT flag,cx,cy,r FROM pairs UNION ALL SELECT flag,cx,cy,r FROM triples
      |         UNION ALL SELECT flag, x AS cx, y AS cy, 0e0 AS r FROM hullc),
      |valid AS (
      |  SELECT c.flag, c.cx, c.cy, c.r
      |  FROM cand c JOIN colext e ON c.flag=e.flag
      |  GROUP BY c.flag, c.cx, c.cy, c.r
      |  HAVING MAX((e.x-c.cx)*(e.x-c.cx)+(e.y-c.cy)*(e.y-c.cy)) <= c.r*c.r*(1+1e-9)+1e-9),
      |best AS (SELECT flag, cx, cy, r,
      |         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY r, cx, cy) AS rk FROM valid)
      |SELECT b.flag, b.cx, b.cy, b.r, n.n_points
      |FROM best b JOIN cnt n ON b.flag=n.flag WHERE rk=1 ORDER BY b.flag""".stripMargin

  val q15 = DeclaredQuery("q15_enclosing_circle", Some(oracle)) { (s, d) =>
    val pts = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      (col("l_partkey") % 97).cast("double").as("x"),
      (col("l_suppkey") % 89).cast("double").as("y"))
    // Two Catalyst reductions BEFORE the typed Welzl aggregator (r16
    // what's-wrong 1, root-caused further in r17):
    //  1. compact to the bounded distinct point domain (≤ 97×89 = 8,633
    //     points per flag by construction) — the oracle's SELECT DISTINCT
    //     CTE — so the encoder boundary is corpus-size-independent;
    //  2. reduce to the HULL-CANDIDATE superset the oracle itself
    //     enumerates from (scaladoc above): column extremes ∩ row
    //     extremes, a 4–6-point superset of the convex hull per flag on
    //     this lattice. MEC(T) = MEC(S) for any support(S) ⊆ T ⊆ S (the
    //     support set is a basis), so the circle is unchanged — and the
    //     r17 profile showed the real cost was Welzl's rebuild loops on
    //     the full 8.6k-point lattice (~1 s/flag), not the encoder.
    // The compacted domain is read three times (col-extremes,
    // row-extremes, n_points) — persist for the query's lifetime; the
    // bench/verify harness clears caches between queries.
    val dom = pts.groupBy("flag", "x", "y").agg(count(lit(1)).as("cnt")).persist()
    val colext = dom.groupBy("flag", "x")
      .agg(min("y").as("y1"), max("y").as("y2"))
      .select(col("flag"), col("x"), explode(array(col("y1"), col("y2"))).as("y"))
    val rowext = dom.groupBy("flag", "y")
      .agg(min("x").as("x1"), max("x").as("x2"))
      .select(col("flag"), explode(array(col("x1"), col("x2"))).as("x"), col("y"))
    val hull = colext.join(rowext, Seq("flag", "x", "y"))
    val circles = hull.groupBy("flag")
      .agg(EnclosingCircle(col("x"), col("y")).as("circle"))
    val counts = dom.groupBy("flag").agg(sum("cnt").as("n_points"))
    circles.join(counts, Seq("flag"))
      .select(col("flag"), col("circle.cx").as("cx"), col("circle.cy").as("cy"),
        col("circle.r").as("r"), col("n_points"))
      .orderBy("flag")
  }

  val all: Seq[DeclaredQuery] = Seq(q15)
}
