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
  * Scale shape: the graph is edge-partitioned; one round = one
  * (edges ⋈ ranks) hash join on src + one map-side-combinable agg on
  * dst + a left join back to nodes — the standard Pregel superstep as
  * three exchanges. Plans re-base on an eager localCheckpoint every 4
  * rounds (the ConnectedComponents lesson: unbounded lineage explodes
  * analysis time). The declared corpus is GENERATED in-query (q75
  * precedent): 2,000 nodes, 3 affine out-edges each, deduped.
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
    val nodes = s.range(0, N.toLong).select(col("id").as("v"))
    val e = nodes.select(col("v").as("src"), ((col("v") * 31 + 7) % N).as("dst"))
      .union(nodes.select(col("v"), (col("v") * 97 + 3) % N))
      .union(nodes.select(col("v"), (col("v") * 233 + 11) % N))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val ed = e.join(deg, "src").persist()
    ed.count() // materialize once; rounds reuse the persisted edge frame
    var pr = nodes.withColumn("r", lit(Init))
    var lastCkpt: Option[org.apache.spark.sql.DataFrame] = None
    for (i <- 1 to Iters) {
      val inflow = ed.join(pr, ed("src") === pr("v"))
        .select(col("dst"), expr("r DIV d").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, nodes("v") === inflow("dst"), "left_outer")
        .select(nodes("v"),
          expr(s"(15L * ${Init}L + 85L * coalesce(inflow, 0L)) DIV 100L").as("r"))
      // shared checkpoint strategy (r15). EAGER since r16 (ADVICE r15):
      // eager materialization lets each retired round's blocks/files be
      // freed as soon as the next checkpoint lands — a lazy chain could
      // retire nothing until the final action and, in reliable mode, left
      // one rdd-<id> dir per re-base on the checkpoint store for the
      // session lifetime. The extra jobs are noise on the fixed 2000-node
      // graph (q103's cells are job-count floors, INDEX †).
      if (i % 4 == 0) {
        val prev = lastCkpt
        pr = graft.util.Checkpoints.ckpt(pr, eager = true)
        lastCkpt = Some(pr)
        prev.foreach(p =>
          org.apache.spark.sql.graftshim.CheckpointShim.unpersistCheckpoint(p))
      }
    }
    val out = pr.select(col("v"), col("r").as("rank_scaled")).orderBy("v")
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
    val nodes = s.range(0, N.toLong).select(col("id").as("v"))
    val raw = nodes.select(col("v").as("s"), ((col("v") * 31 + 7) % N).as("t"))
      .union(nodes.select(col("v"), (col("v") * 97 + 3) % N))
      .union(nodes.select(col("v"), (col("v") * 233 + 11) % N))
      .filter(col("s") =!= col("t"))
    val ed = raw.select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"))
      .distinct().persist()
    val deg = ed.select(col("a").as("v")).union(ed.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by (degree, id): src = the endpoint that sorts lower — the
    // √m out-degree bound that keeps the wedge self-join skew-free
    val withDeg = ed
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val o1 = oriented.as("o1")
    val o2 = oriented.as("o2")
    // wedges at the pivot: two out-edges of the same src, the (dst, dst)
    // pair canonicalized by id so each wedge forms once; the closing edge
    // is then exactly the canonical (x, y) row in `ed` (x < y), so one
    // semi-join per wedge decides the triangle
    val wedges = o1.join(o2, col("o1.src") === col("o2.src") &&
        col("o1.dst") < col("o2.dst"))
      .select(col("o1.dst").as("x"), col("o2.dst").as("y"))
    val nTri = wedges
      .join(ed.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = ed.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(sum(expr("d*(d-1) DIV 2")).cast("long").as("n_wedges"))
    nEdges.crossJoin(nWedges).crossJoin(nTri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("3000000L * n_triangles DIV n_wedges").as("closure_ppm"))
  }

  val all: Seq[DeclaredQuery] = Seq(q103, q108)
}
