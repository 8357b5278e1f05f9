package graft

import graft.tensor.{Kernels, Tensors}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Spark-level algebraic properties over seeded random inputs
  * (SURVEY §5.3): normalize∘denormalize ≈ id, explode preserves the buffer,
  * warp∘inverse ≈ id on the interior for random small affines. */
class RoundTripSpec extends SparkSpec {
  import Tensors._

  private def df(shape: Seq[Int], data: Seq[Float]) =
    spark.range(1).select(col("id").as("key"),
      tensor(typedLit(shape), typedLit(data)).as("t"))

  test("cache → parquet → serve round-trip: serve standardize type-checks and computes on reloaded data") {
    import graft.pipeline.{DatasetCacher, GraftConfig, NormalizeConfig, TransformPlanner}
    val cfg = GraftConfig(
      datasetNames = Seq("mm1"), keyPairs = Map("image" -> "label"),
      dimensionality = "2D", targetSize = (2, 2), nrClasses = 3,
      normalize = NormalizeConfig(mode = "standardize", referenceLevel = "saved"))
    val n = 2 * 2 * 1 * 2 * 2
    val records = spark.range(2).select(
      concat(lit("subj"), col("id")).as("subject_id"),
      lit("mm1").as("dataset"),
      tensor(typedLit(Seq(2, 2, 1, 2, 2)),
        transform(sequence(lit(1), lit(n)), i => (i + col("id") * 100).cast("float"))).as("image"),
      tensor(typedLit(Seq(2, 2, 1, 2, 2)),
        transform(sequence(lit(1), lit(n)), i => (i % 3).cast("float"))).as("label"))
    val cached = TransformPlanner.cachePlan(cfg, Seq("image"), Seq("label"))(records)
    val root = java.nio.file.Files.createTempDirectory("graft-rt").toString
    val path = DatasetCacher.materialize(spark, cached,
      Seq("subject_id", "dataset", "frame_nr", "slice_nr"),
      root, cfg, records.select("subject_id"), "subject_id")
    // the reload path is the point: parquet read-back types arrays as
    // containsNull=true, and the serve-side kernels must accept that
    val reloaded = DatasetCacher.load(spark, path)
    val served = TransformPlanner.servePlan(cfg, Seq("image"), Seq("label"),
      keyCol = "subject_id", augmented = false)(reloaded)
    val rows = served.select(col("subject_id"), col("frame_nr"), col("slice_nr"),
      col("image.data").as("data")).collect()
    assert(rows.length == 8)
    // standardized buffers: mean ≈ 0 across each record's source volume
    // stats, values finite
    rows.foreach { r =>
      val data = r.getSeq[Float](3)
      assert(data.length == 4)
      assert(data.forall(v => !v.isNaN && !v.isInfinite))
    }
    // manifest read-back keeps the records schema (no partition-column
    // type re-inference)
    val mf = DatasetCacher.manifest(spark, path)
    assert(mf.schema("dataset").dataType == org.apache.spark.sql.types.StringType)
    assert(mf.count() == 8)
  }

  test("normalize∘denormalize ≈ identity (random buffers)") {
    val rng = new Random(1)
    for (_ <- 1 to 10) {
      val n = 4 + rng.nextInt(20)
      val data = Seq.fill(n)(rng.nextFloat() * 100 - 50)
      val mn = data.min; val mx = data.max
      val normed = df(Seq(1, 1, 1, 1, n), data)
        .select(normalize(col("t"), 0, 1).as("t"))
        .select(col("t.data")).head().getSeq[Float](0)
      val recon = normed.map(v => v * (mx - mn) + mn)
      data.zip(recon).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-3, s"roundtrip drift: $a vs $b")
      }
    }
  }

  test("explode 2d concatenation reconstructs the original buffer (random shapes)") {
    val rng = new Random(2)
    for (_ <- 1 to 8) {
      val (t, d, c, h, w) = (1 + rng.nextInt(3), 1 + rng.nextInt(3),
        1 + rng.nextInt(2), 1 + rng.nextInt(4), 1 + rng.nextInt(4))
      val data = Seq.fill(t * d * c * h * w)(rng.nextFloat())
      val exploded = explodeTo2d(df(Seq(t, d, c, h, w), data), "t")
        .orderBy("frame_nr", "slice_nr")
        .select(col("t.data")).collect().flatMap(_.getSeq[Float](0)).toSeq
      assert(exploded == data, s"shape ($t,$d,$c,$h,$w)")
      assert(explodeTo2d(df(Seq(t, d, c, h, w), data), "t").count() == t * d)
    }
  }

  test("warp∘inverse ≈ identity on interior for random small affines") {
    val rng = new Random(3)
    for (trial <- 1 to 5) {
      // smooth (band-limited) image: bilinear interpolation can reconstruct
      // these; per-pixel noise cannot round-trip any resampler
      val img = (0 until 16 * 16).map { i =>
        val y = i / 16; val x = i % 16
        (4 * math.sin(x * 0.4 + trial) + 4 * math.cos(y * 0.3) + 8).toFloat
      }
      val ang = (rng.nextDouble() - 0.5) * 0.3
      val sc = 0.9 + rng.nextDouble() * 0.2
      val m = Seq(math.cos(ang) / sc, math.sin(ang) / sc, rng.nextDouble() - 0.5,
        -math.sin(ang) / sc, math.cos(ang) / sc, rng.nextDouble() - 0.5)
      val base = df(Seq(1, 1, 1, 16, 16), img)
      val round = base.select(
        Kernels.affineResample(col("t.shape"), col("t.data"), typedLit(m),
          lit(16), lit(16), lit(true)).as("w"))
        .select(Kernels.affineResample(col("w._1"), col("w._2"),
          Kernels.invertAffine(typedLit(m)), lit(16), lit(16), lit(true)).as("b"))
        .select(col("b._2")).head().getSeq[Float](0)
      var err = 0.0; var cnt = 0
      for (y <- 4 until 12; x <- 4 until 12) {
        err += math.abs(img(y * 16 + x) - round(y * 16 + x)); cnt += 1
      }
      assert(err / cnt < 0.5, s"trial $trial mean interior error ${err / cnt}")
    }
  }

  test("scalableCumSum equals single-window prefix sum in md5-hex60 order") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.customer(spark, sf0001).withColumn("weight", col("c_acctbal") + 1000.0)
    val scalable = graft.pipeline.BatchServer.scalableCumSum(df, "c_custkey", "weight")
      .select(col("c_custkey"), col("_cum_hi")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val naive = df.withColumn("_cum_hi", sum(col("weight")).over(
      Window.orderBy(graft.util.Det.hex60(md5(col("c_custkey").cast("string"))),
        col("c_custkey"))))
      .select(col("c_custkey"), col("_cum_hi")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalable.keySet == naive.keySet)
    scalable.foreach { case (k, v) =>
      assert(math.abs(v - naive(k)) < 1e-6, s"custkey $k: $v vs ${naive(k)}")
    }
  }

  test("Ranks.globalRowNumber/globalDenseRank equal the single-window forms") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Ranks
    import graft.util.Det
    val df = Tables.customer(spark, sf0001)
    val key = Det.seededKey("77", col("c_custkey"))
    val twoPhase = Ranks.globalRowNumber(df, Ranks.hexBucket(key),
      Seq(key, col("c_custkey")), "rn")
      .select(col("c_custkey"), col("rn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df.withColumn("rn",
      row_number().over(Window.orderBy(key, col("c_custkey"))))
      .select(col("c_custkey"), col("rn")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(twoPhase == naive)
    val dr = Ranks.globalDenseRank(df, col("c_nationkey"), descending = true, "dr")
      .select(col("c_custkey"), col("dr")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drNaive = df.withColumn("dr",
      dense_rank().over(Window.orderBy(col("c_nationkey").desc)))
      .select(col("c_custkey"), col("dr")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(dr == drNaive)
  }

  test("Ranks.globalDenseRank fails loudly when the key domain is unbounded") {
    import graft.operators.Ranks
    val wide = spark.range(Ranks.DenseRankMaxKeys + 5).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Ranks.globalDenseRank(wide, col("k"), descending = false, "dr")
    }
    assert(e.getMessage.contains("globalRowNumber"),
      "guard message must name the join-based alternative")
  }

  test("inverse-frequency weight × group size = total (any grouping)") {
    val df = Tables.customer(spark, sf0001)
    val w = graft.pipeline.BatchServer.inverseFrequencyWeights(df, Seq("c_mktsegment", "c_nationkey"))
    val total = df.count().toDouble
    val bad = w.groupBy("c_mktsegment", "c_nationkey")
      .agg(first("weight").as("w"), count(lit(1)).as("n"))
      .withColumn("prod", col("w") * col("n"))
      .filter(abs(col("prod") - total) > 1e-6)
    assert(bad.count() == 0)
  }
}
