package graft.queries

import graft.DeclaredQuery
import org.apache.spark.sql.functions._

/** Iterative graph analytics (SURVEY §2.13 X67) — the Pregel-shaped
  * message-passing loop connected components (operators/
  * ConnectedComponents) doesn't cover: per-round JOIN-on-edges →
  * aggregate-messages → update-state, here instantiated as PageRank.
  *
  * Determinism across engines is the interesting part: floating-point
  * PageRank is NOT reproducible under Spark's order-free partial sums,
  * so ranks are scaled integers (10^12 total mass) and every operation
  * is integer arithmetic — per-edge contribution `r DIV out_degree`,
  * damping `(15·r0 + 85·inflow) DIV 100` — whose sums are
  * order-independent. The oracle replays the identical recurrence as
  * UNROLLED chained CTEs (aggregates are not allowed inside a
  * RECURSIVE term), one per iteration — bit-equal BIGINTs, no
  * tolerance needed.
  *
  * Scale shape (r18 rewrite, guide §2.4/§3.1): the declared graph is
  * CONTRACT-PINNED at 2,000 nodes / ≤6,000 edges — generated in-query
  * from `range`, the same size at every sf — so every per-round frame
  * (ranks, inflow) is a fixed-size ≤2,000-row relation and broadcasts
  * by construction, the q33 fixed-panel posture. The r17 plan ran each
  * superstep as three exchanges (ed⋈pr hash join, dst agg, SortMergeJoin
  * LeftOuter back to nodes) × 10 rounds + eager localCheckpoints every
  * 4 rounds: ~38 Exchanges and 4 SMJs in the final plan, a pure
  * scheduling floor (INDEX †, 4.6 s quiet / 12.4 s under load). Now the
  * edge frame is hash-partitioned by dst ONCE (fixed 8 partitions —
  * the frame is 6,000 rows at any scale) and persisted; each round is
  * ed ⋈ broadcast(pr) (BHJ, partitioning preserved) → groupBy(dst)
  * (distribution already satisfied → NO exchange) → nodes ⋈
  * broadcast(inflow) LeftOuter (BHJ). Zero exchanges per superstep; the
  * whole 10-round recurrence is one action whose only exchanges are the
  * edge-build distinct/agg and the final ORDER BY. With ~50 plan nodes
  * total the lineage no longer needs checkpoint re-basing (the
  * ConnectedComponents lesson applied to UNBOUNDED iteration counts;
  * 10 pinned rounds of 5-node subplans analyze in milliseconds). A
  * general billion-edge PageRank keeps the shuffle plan — here the
  * broadcast side is pinned by the query text itself. Results are
  * bit-identical: the integer recurrence, join keys, and grouping are
  * unchanged; only join strategy/partitioning moved.
  */
object GraphQueries {

  private val N = 2000
  private val Iters = 10
  private val Scale = 1000000000000L // total rank mass, integer
  private val Init = Scale / N

  // ---------------------------------------------------------------- Q103
  val q103 = DeclaredQuery(
    "q103_pagerank", {
      val edgeSql =
        s"""e AS (SELECT v AS src, (v*31+7) % $N AS dst FROM nodes
           |      UNION SELECT v, (v*97+3) % $N FROM nodes
           |      UNION SELECT v, (v*233+11) % $N FROM nodes),
           |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
           |ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg ON e.src = deg.src),
           |p0 AS (SELECT v, CAST($Init AS BIGINT) AS r FROM nodes)""".stripMargin
      val iterSql = (1 to Iters).map { i =>
        s"""p$i AS (
           |  SELECT n.v,
           |         CAST((15 * CAST($Init AS BIGINT) + 85 * COALESCE(SUM(p${i - 1}.r // ed.d), 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n
           |  LEFT JOIN ed ON ed.dst = n.v
           |  LEFT JOIN p${i - 1} ON p${i - 1}.v = ed.src
           |  GROUP BY n.v)""".stripMargin
      }.mkString(",\n")
      Some(
        s"""WITH nodes AS (SELECT CAST(range AS BIGINT) AS v FROM range(0, $N)),
           |$edgeSql,
           |$iterSql
           |SELECT v, r AS rank_scaled FROM p$Iters ORDER BY v""".stripMargin)
    }) { (s, d) =>
    // 4 slices, not defaultParallelism: the range is a pinned 2,000 rows
    // at every sf, and 3 unioned scans at 32 slices each meant ~96
    // near-empty map tasks of pure launch overhead per pass (JobProfile)
    val nodes = s.range(0, N.toLong, 1, 4).select(col("id").as("v"))
    val e = nodes.select(col("v").as("src"), ((col("v") * 31 + 7) % N).as("dst"))
      .union(nodes.select(col("v"), (col("v") * 97 + 3) % N))
      .union(nodes.select(col("v"), (col("v") * 233 + 11) % N))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // partitioned by dst ONCE so every round's groupBy("dst") finds its
    // distribution already satisfied (guide §2.4: establish the
    // partitioning once). 8 partitions is frame-sized, not box-sized:
    // the edge frame is a pinned 6,000 rows at every sf.
    val ed = e.join(broadcast(deg), "src")
      .repartition(8, col("dst")).persist()
    ed.count() // materialize once; rounds reuse the persisted edge frame
    // Iterate on the INFLOW vector, not the rank vector: pr_i is a
    // per-row projection of inflow_i (r(v) = (15·r0 + 85·inflow(v)) DIV
    // 100, inflow 0 when absent), and round i+1 only reads pr_i at
    // ed.src — so the projection is substituted INTO the next round's
    // join and each superstep is exactly one broadcast (≤2,000 rows by
    // contract) + one already-partitioned agg: no nodes join, half the
    // broadcast/stage count of the rank-carrying loop. Round 1's ranks
    // are the constant Init, so it needs no join at all. The nodes
    // frame re-enters once, at the end, to give dangling nodes their
    // damp(0) rank — bit-identical to joining it every round.
    var inflow = ed.select(col("dst"), expr(s"${Init}L DIV d").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("inflow"))
      .select(col("dst").as("iv"), col("inflow").as("if"))
    for (i <- 2 to Iters) {
      inflow = ed.join(broadcast(inflow), ed("src") === col("iv"), "left_outer")
        .select(col("dst"),
          expr(s"((15L * ${Init}L + 85L * coalesce(`if`, 0L)) DIV 100L) DIV d").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
        .select(col("dst").as("iv"), col("inflow").as("if"))
    }
    val out = nodes.join(broadcast(inflow), nodes("v") === col("iv"), "left_outer")
      .select(nodes("v"),
        expr(s"(15L * ${Init}L + 85L * coalesce(`if`, 0L)) DIV 100L").as("rank_scaled"))
      .orderBy("v")
    out
  }

  // ---------------------------------------------------------------- Q108
  /** X73: triangle counting + global clustering over q103's generated
    * graph — the second canonical distributed-graph shape (PageRank
    * exercises iterate-and-message; triangles exercise the 2-hop join).
    *
    * Spark side runs the DEGREE-ORIENTED algorithm (Suri & Vassilvitskii,
    * WWW'11): orient each undirected edge from its lower-(degree, id)
    * endpoint to the higher, self-join out-edges on the pivot to form
    * wedges, then semi-join the closing edge. Orientation bounds every
    * out-degree by O(√m), so the wedge join — the step that explodes on
    * skewed graphs — stays O(m^{3/2}) total with no hot key, which is
    * the plan that survives a power-law graph at 100×. The oracle counts
    * the same triangles with the naive a<b<c id-ordering — a different
    * (quadratic-on-hubs) plan but provably the same count, so the
    * comparison pins the answer while letting each engine keep its own
    * join order.
    *
    * Everything reported is exact integer arithmetic: triangle count,
    * wedge count Σ d(d−1)/2, and closure as parts-per-million via
    * integer division (3e6·tri DIV wedges).
    */
  val q108 = DeclaredQuery(
    "q108_triangles", {
      Some(
        s"""WITH nodes AS (SELECT CAST(range AS BIGINT) AS v FROM range(0, $N)),
           |raw AS (SELECT v AS s, (v*31+7) % $N AS t FROM nodes
           |        UNION SELECT v, (v*97+3) % $N FROM nodes
           |        UNION SELECT v, (v*233+11) % $N FROM nodes),
           |ed AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
           |       FROM raw WHERE s <> t),
           |deg AS (SELECT v, COUNT(*) AS d FROM (
           |          SELECT a AS v FROM ed UNION ALL SELECT b FROM ed)
           |        GROUP BY v),
           |tri AS (SELECT COUNT(*) AS n_tri
           |        FROM ed e1 JOIN ed e2 ON e2.a = e1.b
           |                   JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
           |agg AS (SELECT (SELECT COUNT(*) FROM ed) AS n_edges,
           |               (SELECT SUM(d*(d-1)//2) FROM deg) AS n_wedges,
           |               (SELECT n_tri FROM tri) AS n_triangles)
           |SELECT CAST(n_edges AS BIGINT) AS n_edges,
           |       CAST(n_wedges AS BIGINT) AS n_wedges,
           |       CAST(n_triangles AS BIGINT) AS n_triangles,
           |       CAST(3000000 * n_triangles // n_wedges AS BIGINT) AS closure_ppm
           |FROM agg""".stripMargin)
    }) { (s, d) =>
    // 4 slices, not defaultParallelism: the range is a pinned 2,000 rows
    // at every sf, and 3 unioned scans at 32 slices each meant ~96
    // near-empty map tasks of pure launch overhead per pass (JobProfile)
    val nodes = s.range(0, N.toLong, 1, 4).select(col("id").as("v"))
    val raw = nodes.select(col("v").as("s"), ((col("v") * 31 + 7) % N).as("t"))
      .union(nodes.select(col("v"), (col("v") * 97 + 3) % N))
      .union(nodes.select(col("v"), (col("v") * 233 + 11) % N))
      .filter(col("s") =!= col("t"))
    // r18 (guide §3.1): the graph is contract-pinned at 2,000 nodes /
    // ≤6,000 canonical edges — every derived frame (deg, oriented, the
    // closing-edge set) is fixed-size at any sf, so each join broadcasts
    // its bounded side and the r17 plan's ~47 Exchanges collapse to the
    // edge-build distinct + deg agg + the three scalar aggs. The
    // degree-oriented wedge algorithm, join conditions, and integer
    // arithmetic are unchanged (identical results); at real graph scale
    // the shuffle plan returns — here the broadcast side is pinned by
    // the query text (q33 fixed-panel posture).
    val ed = raw.select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"))
      .distinct().persist()
    // eager fill: the broadcast builds below run on concurrent threads and
    // would otherwise race the lazy cache fill (the r11 CC finding)
    ed.count()
    // deg feeds THREE consumers (the two orientation joins and nWedges)
    // and oriented TWO (both wedge-join sides) — persist both so each is
    // computed once instead of once per broadcast subtree (JobProfile:
    // the overlapping 1-2 s broadcast-build jobs were recomputing these)
    val deg = ed.select(col("a").as("v")).union(ed.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    deg.count()
    // orient by (degree, id): src = the endpoint that sorts lower — the
    // √m out-degree bound that keeps the wedge self-join skew-free
    val withDeg = ed
      .join(broadcast(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")), "a")
      .join(broadcast(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    oriented.count()
    val o1 = oriented.as("o1")
    val o2 = oriented.as("o2")
    // wedges at the pivot: two out-edges of the same src, the (dst, dst)
    // pair canonicalized by id so each wedge forms once; the closing edge
    // is then exactly the canonical (x, y) row in `ed` (x < y), so one
    // semi-join per wedge decides the triangle
    val wedges = o1.join(broadcast(o2), col("o1.src") === col("o2.src") &&
        col("o1.dst") < col("o2.dst"))
      .select(col("o1.dst").as("x"), col("o2.dst").as("y"))
    val nTri = wedges
      .join(broadcast(ed.select(col("a").as("x"), col("b").as("y"))),
        Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = ed.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(sum(expr("d*(d-1) DIV 2")).cast("long").as("n_wedges"))
    nEdges.crossJoin(nWedges).crossJoin(nTri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("3000000L * n_triangles DIV n_wedges").as("closure_ppm"))
  }

  val all: Seq[DeclaredQuery] = Seq(q103, q108)
}
