package graft

import graft.queries.GraphQueries

/** q103's integer PageRank — invariants the oracle hash can't express:
  * mass conservation under floor division and the damping floor. */
class GraphSpec extends SparkSpec {

  test("integer pagerank conserves mass up to floor loss and floors at 15%") {
    val rows = GraphQueries.q103.build(spark, sf0001).collect()
    assert(rows.length == 2000)
    val scale = 1000000000000L
    val init = scale / 2000
    val total = rows.map(_.getLong(1)).sum
    // every DIV floors: per node ≤ ~(100 + in-degree) units lost per
    // round; after 10 rounds the mass must still be within 0.1% of Scale
    assert(total <= scale, s"mass grew: $total > $scale")
    assert(total > scale - scale / 1000, s"mass leaked: $total")
    // damping floor: no rank below the teleport share (15% of uniform,
    // up to the two floors in the recurrence)
    val floorRank = (15L * init) / 100L
    assert(rows.forall(_.getLong(1) >= floorRank - 1),
      "a node fell below the teleport floor")
    // ranks are NOT uniform — the affine edge maps concentrate mass
    assert(rows.map(_.getLong(1)).distinct.length > 100)
  }
}
