package graft

import graft.operators.TopK
import graft.queries.RankQueries
import org.apache.spark.sql.functions._

/** Bounded top-k aggregate laws: result equals the window-rank reference,
  * k is honored, map-side partial aggregation appears in the plan, and the
  * packing/unpacking arithmetic in q95 is exact. */
class TopKSpec extends SparkSpec {

  test("bottomK equals sort-then-take under any partitioning") {
    import spark.implicits._
    // values chosen to straddle partition boundaries and include adjacent keys
    val vals = (0 until 500).map(i => ((i * 2654435761L) % 10007, i.toLong))
    val packed = vals.map { case (k, i) => k * (1L << 32) + i }
    val expected = packed.sorted.take(7)
    for (parts <- Seq(1, 3, 8)) {
      val got = packed.toDF("p").repartition(parts)
        .agg(TopK.bottomK(7)(col("p")).as("ks"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("groups smaller than k return all their values, in order") {
    import spark.implicits._
    val got = Seq(("a", 5L), ("a", 3L), ("b", 9L)).toDF("g", "p")
      .groupBy("g").agg(TopK.bottomK(10)(col("p")).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(3L, 5L) && got("b") == Seq(9L))
  }

  test("q95 matches the window-rank reference on the documents table") {
    val got = RankQueries.q95.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val ref = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.sortBy { case (_, id, n) => (-n, id) }.take(5).zipWithIndex
          .map { case ((_, id, n), i) => (src, i + 1, id, n) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == ref)
  }

  test("partial aggregation is map-side (no corpus-wide window in the plan)") {
    val plan = RankQueries.q95.build(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a two-phase aggregate plan, got:\n$plan")
    assert(!plan.contains("Window"), "q95 must not plan a window")
  }
}
