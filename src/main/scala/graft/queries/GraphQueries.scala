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
    for (i <- 1 to Iters) {
      val inflow = ed.join(pr, ed("src") === pr("v"))
        .select(col("dst"), expr("r DIV d").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, nodes("v") === inflow("dst"), "left_outer")
        .select(nodes("v"),
          expr(s"(15L * ${Init}L + 85L * coalesce(inflow, 0L)) DIV 100L").as("r"))
      if (i % 4 == 0) pr = pr.localCheckpoint(false)
    }
    val out = pr.select(col("v"), col("r").as("rank_scaled")).orderBy("v")
    out
  }

  val all: Seq[DeclaredQuery] = Seq(q103)
}
