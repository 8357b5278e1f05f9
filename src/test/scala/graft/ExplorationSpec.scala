package graft

import graft.pipeline.Exploration
import graft.tensor.Tensors
import org.apache.spark.sql.functions._

class ExplorationSpec extends SparkSpec {

  /** 2 datasets × 5 records with known per-record means 1..5 / 11..15. */
  private def records = spark.range(10).select(
    when(col("id") < 5, "dsA").otherwise("dsB").as("dataset"),
    (col("id") % 5 + 1 + when(col("id") >= 5, 10).otherwise(0)).cast("double").as("base"))
    .withColumn("t", Tensors.tensor(typedLit(Seq(1, 1, 1, 1, 4)),
      transform(sequence(lit(1), lit(4)), _ => col("base").cast("float"))))

  test("recordFeatures + sweep produce exact nearest-rank quantiles") {
    val out = Exploration.sweep(
      Exploration.recordFeatures(records, "t"), "dataset", "rec_mean")
      .orderBy("dataset").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getAs[String]("dataset") == "dsA")
    assert(a.getAs[Long]("n") == 5)
    assert(a.getAs[Double]("mean") == 3.0)
    // population std of {1..5} = sqrt(2)
    assert(math.abs(a.getAs[Double]("std_pop") - math.sqrt(2.0)) < 1e-9)
    assert(a.getAs[Double]("q00") == 1.0 && a.getAs[Double]("q50") == 3.0
      && a.getAs[Double]("q100") == 5.0)
    val b = out(1)
    assert(b.getAs[Double]("q50") == 13.0)
  }

  test("explore returns one sweep per feature") {
    val m = Exploration.explore(records, "t", "dataset")
    assert(m.keySet == Set("rec_mean", "rec_max", "rec_std"))
    assert(m("rec_std").collect().forall(_.getAs[Double]("mean") == 0.0))
  }
}
