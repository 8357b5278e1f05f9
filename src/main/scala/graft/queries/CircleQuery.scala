package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.operators.EnclosingCircle
import org.apache.spark.sql.functions._

/** Q15 — A11/A12: smallest enclosing circle of the per-group point cloud
  * (`transforms/utils.py:129-134`: gt_center/gt_size from label pixels).
  * Points are (l_partkey mod 97, l_suppkey mod 89) per return flag.
  *
  * The minimal enclosing circle is mathematically unique, but no SQL engine
  * computes it natively → no DuckDB oracle (driver records rows-only);
  * correctness is pinned by EnclosingCircleSpec's brute-force O(n³)
  * cross-check instead.
  */
object CircleQuery {

  val q15 = DeclaredQuery("q15_enclosing_circle", None) { (s, d) =>
    val pts = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      (col("l_partkey") % 97).cast("double").as("x"),
      (col("l_suppkey") % 89).cast("double").as("y"))
    pts.groupBy("flag")
      .agg(EnclosingCircle(col("x"), col("y")).as("circle"),
        count(lit(1)).as("n_points"))
      .select(col("flag"), col("circle.cx").as("cx"), col("circle.cy").as("cy"),
        col("circle.r").as("r"), col("n_points"))
      .orderBy("flag")
  }

  val all: Seq[DeclaredQuery] = Seq(q15)
}
