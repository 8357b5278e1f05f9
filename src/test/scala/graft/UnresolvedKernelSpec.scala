package graft

import org.apache.spark.sql.functions._
import graft.tensor.Kernels

/** Regression guard for the round-4 BufferStats breakage: every custom
  * Catalyst expression is constructed over an UNRESOLVED `col(...)` (the
  * normal call shape — `Kernels.bufferStats(col("image.data"))`), so any
  * eager `child.dataType` access in a constructor throws before analysis
  * can bind the column. These tests build the plan from unresolved columns
  * AND evaluate one row, so both construction and the post-resolution eval
  * path are covered. Invisible to the oracle gate by design (declared
  * queries route through HOFs); this spec is the gate for that bug class.
  */
class UnresolvedKernelSpec extends SparkSpec {
  import spark.implicits._

  test("BufferStats constructs over unresolved col and evaluates") {
    val df = Seq((1, Array(1.0f, 2.0f, 3.0f))).toDF("id", "data")
    // construction must not touch child.dataType eagerly
    val c = Kernels.bufferStats(col("data"))
    val row = df.select(c.as("s")).selectExpr(
      "s._1 as mn", "s._2 as mx", "s._3 as mean", "s._5 as n").head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 3.0)
    assert(row.getDouble(2) == 2.0)
    assert(row.getLong(3) == 3L)
  }

  test("ShiftScale constructs over unresolved col and evaluates") {
    val df = Seq((1, Array(1.0f, 2.0f))).toDF("id", "data")
    val c = Kernels.shiftScale(col("data"), lit(1.0), lit(2.0))
    val out = df.select(c.as("v")).head().getSeq[Float](0)
    assert(out == Seq(4.0f, 6.0f))
  }

  test("ShiftScale accepts nullable-typed arrays and rejects null elements loudly") {
    // transform()-built arrays type as containsNull=true even when non-null
    val df = Seq((1, Array(1.0f, 2.0f))).toDF("id", "data")
      .withColumn("data", transform(col("data"), x => x + 0.0f))
    val out = df.select(Kernels.shiftScale(col("data"), lit(0.0), lit(1.0)).as("v"))
      .head().getSeq[Float](0)
    assert(out == Seq(1.0f, 2.0f))

    val withNull = Seq((1, Seq(Some(1.0f), None))).toDF("id", "data")
    val ex = intercept[Exception] {
      withNull.select(Kernels.shiftScale(col("data"), lit(0.0), lit(1.0))).collect()
    }
    assert(ex.getMessage.contains("null element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null element")))
  }

  test("PresentClasses constructs over unresolved col, evaluates, rejects null elements") {
    val df = Seq((1, Array(2.2f, 0.1f, 2.0f))).toDF("id", "data")
    val out = df.select(Kernels.presentClasses(col("data")).as("v"))
      .head().getSeq[Int](0)
    assert(out == Seq(0, 2))

    val withNull = Seq((1, Seq(Some(1.0f), None))).toDF("id", "data")
    val ex = intercept[Exception] {
      withNull.select(Kernels.presentClasses(col("data"))).collect()
    }
    assert(ex.getMessage.contains("null element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null element")))
  }

  test("BufferStats rejects null elements loudly on nullable-typed input") {
    val withNull = Seq((1, Seq(Some(1.0f), None))).toDF("id", "data")
    val ex = intercept[Exception] {
      withNull.select(Kernels.bufferStats(col("data"))).collect()
    }
    assert(ex.getMessage.contains("null element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null element")))
  }

  test("VecDot constructs over unresolved cols and evaluates") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val c = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.VecDot(
        org.apache.spark.sql.graftshim.ColumnShim.expression(col("a")),
        org.apache.spark.sql.graftshim.ColumnShim.expression(col("b"))))
    assert(df.select(c).head().getDouble(0) == 11.0)
  }
}
