package graft

import graft.pipeline.{Ivm, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental view maintenance == full recompute, end-to-end through a
  * snapshot table's change feed. */
class IvmSpec extends SparkSpec {

  private def canon(df: DataFrame) =
    df.orderBy("lang").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("refresh over CDC equals recompute across append, mutation, and group death") {
    import spark.implicits._
    val t = Files.createTempDirectory("ivm").resolve("t").toString
    def rows(data: Seq[(Long, String, Long)]) = data.toDF("id", "lang", "chars")

    val v1 = Seq(1L -> "en", 2L -> "en", 3L -> "fr", 4L -> "de")
      .map { case (i, l) => (i, l, i * 10) }
    Snapshots.commit(spark, rows(v1), t, files = 2)
    var state = Ivm.recompute(Snapshots.read(spark, t, 1),
      Seq("lang"), Seq("chars"))

    // append: new en + a first zh row
    Snapshots.commit(spark,
      rows(Seq((5L, "en", 7L), (6L, "zh", 9L))), t, files = 1)
    state = Ivm.refresh(state, t, 1, 2, Seq("lang"), Seq("chars"))
    assert(canon(state) ==
      canon(Ivm.recompute(Snapshots.read(spark, t, 2), Seq("lang"), Seq("chars"))))

    // overwrite: mutate one row (update = delete+insert in the diff),
    // drop ALL de rows (group death), drop one en
    val v3 = Seq((1L, "en", 10L), (2L, "en", 999L), (3L, "fr", 30L),
      (5L, "en", 7L), (6L, "zh", 9L))
    Snapshots.commit(spark, rows(v3), t, overwrite = true, files = 2)
    state = Ivm.refresh(state, t, 2, 3, Seq("lang"), Seq("chars"))
    val full = Ivm.recompute(Snapshots.read(spark, t, 3), Seq("lang"), Seq("chars"))
    assert(canon(state) == canon(full))
    // the dead group is GONE from maintained state, not a zero row
    assert(!state.collect().map(_.getString(0)).contains("de"))
  }

  test("float sum columns are rejected with the cents guidance") {
    import spark.implicits._
    val state = Seq(("en", 1L, 1L)).toDF("lang", "n", "sum_x")
    val changes = Seq(("insert", "en", 1.5)).toDF("_op", "lang", "x")
    val e = intercept[IllegalArgumentException](
      Ivm.applyDelta(state, changes, Seq("lang"), Seq("x")))
    assert(e.getMessage.contains("cents"))
  }
}
