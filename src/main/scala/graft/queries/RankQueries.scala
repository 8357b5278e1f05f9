package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.operators.TopK
import org.apache.spark.sql.functions._

/** Grouped ranking via the bounded top-k aggregate ([[graft.operators.TopK]])
  * — the scale-correct form of "top n rows per group" when groups are few
  * and huge (the skewed-window case `row_number OVER (PARTITION BY ...)`
  * handles badly: one task sorts a corpus-sized slice per group).
  */
object RankQueries {

  // ---------------------------------------------------------------- Q95
  /** X57: top-5 documents per source by (n_chars DESC, doc_id ASC), via an
    * O(k)-state bounded-heap aggregate with map-side partial aggregation —
    * each executor reduces its slice of a group to ≤5 packed longs before
    * the shuffle, so the reducer merges #partitions k-element arrays
    * instead of sorting the group.
    *
    * Sort keys pack as `(2^31-1 - n_chars)·2^32 + doc_id` so ascending
    * Long order IS (n_chars DESC, doc_id ASC) and ties are impossible;
    * unpacking is exact integer arithmetic. The oracle spells the same
    * ranking as a QUALIFY window — fine at oracle scale, wrong at 100 TB,
    * which is the point of the operator. */
  val q95 = DeclaredQuery(
    "q95_topk_per_group",
    Some("""SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, n_chars FROM (
           |  SELECT source, doc_id, n_chars,
           |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
           |  FROM documents)
           |WHERE rank <= 5 ORDER BY source, rank""".stripMargin)) { (s, d) =>
    val Cap = Int.MaxValue.toLong       // n_chars < 2^31 (document length)
    val Shift = 1L << 32                // doc_id < 2^32 (synthetic id space)
    Tables.documents(s, d)
      .select(col("source"),
        ((lit(Cap) - col("n_chars")) * Shift + col("doc_id")).as("packed"))
      .groupBy("source")
      .agg(TopK.bottomK(5)(col("packed")).as("ps"))
      .select(col("source"), posexplode(col("ps")))
      .select(col("source"),
        (col("pos") + 1).cast("int").as("rank"),
        pmod(col("col"), lit(Shift)).cast("long").as("doc_id"),
        (lit(Cap) - expr(s"col DIV $Shift")).cast("long").as("n_chars"))
      .orderBy("source", "rank")
  }

  val all: Seq[DeclaredQuery] = Seq(q95)
}
