package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.tensor.Tensors
import graft.util.Det
import org.apache.spark.sql.functions._

/** Driver-checked queries exercising the tensor layer end-to-end (SURVEY
  * §2.9): tensors are built from lineitem groups (sorted exact-cent prices
  * as the float buffer), then run through the HOF operators. The oracles
  * recompute the same float arithmetic relationally — float32 casts are
  * IEEE-identical in both engines.
  */
object TensorQueries {

  /** per-order float buffer of sorted prices (exact cents → float). */
  private def orderTensors(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), Det.cents(col("l_extendedprice")).as("c"))
      .groupBy("l_orderkey")
      .agg(transform(array_sort(collect_list(col("c"))),
        c => (c.cast("double") / lit(1e2)).cast("float")).as("data"))

  // ---------------------------------------------------------------- Q40
  /** A4 via the tensor stats HOF: one-pass min/max/mean/std over the
    * buffer. Oracle recomputes from the relational rows; the HOF folds in
    * sorted order while DuckDB's SUM order is free — both land ~1e-12
    * apart, far inside the 6-decimal rounding. */
  val q40 = DeclaredQuery(
    "q40_tensor_stats",
    Some("""WITH f AS (
           |  SELECT l_orderkey,
           |         CAST(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE)/1e2 AS FLOAT) AS pf
           |  FROM lineitem)
           |SELECT l_orderkey, COUNT(*) AS n,
           |       CAST(MIN(pf) AS DOUBLE) AS amin, CAST(MAX(pf) AS DOUBLE) AS amax,
           |       SUM(CAST(pf AS DOUBLE))/CAST(COUNT(*) AS DOUBLE) AS mean,
           |       sqrt(greatest(
           |         SUM(CAST(pf AS DOUBLE)*CAST(pf AS DOUBLE))/CAST(COUNT(*) AS DOUBLE)
           |           - (SUM(CAST(pf AS DOUBLE))/CAST(COUNT(*) AS DOUBLE))*(SUM(CAST(pf AS DOUBLE))/CAST(COUNT(*) AS DOUBLE)),
           |         0.0)) AS std
           |FROM f GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)) { (s, d) =>
    val t = orderTensors(s, d)
      .select(col("l_orderkey"), Tensors.stats(col("data")).as("st"))
    t.select(col("l_orderkey"), col("st.numel").as("n"),
      col("st.amin"), col("st.amax"), col("st.mean"), col("st.std").as("std"))
      .orderBy("l_orderkey")
  }

  // ---------------------------------------------------------------- Q41
  /** T2 explode pipeline end-to-end: per-order (2,3,1,1,1) tensor from the
    * first 6 sorted prices, exploded to 2-D records with frame/slice
    * counters; oracle mirrors with row_number arithmetic. */
  val q41 = DeclaredQuery(
    "q41_tensor_explode",
    Some("""WITH r AS (
           |  SELECT l_orderkey,
           |         CAST(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE)/1e2 AS FLOAT) AS pf,
           |         row_number() OVER (PARTITION BY l_orderkey
           |           ORDER BY CAST(ROUND(l_extendedprice*100) AS BIGINT)) - 1 AS rn,
           |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n
           |  FROM lineitem)
           |SELECT l_orderkey, CAST(rn // 3 AS INTEGER) AS frame_nr,
           |       CAST(rn % 3 AS INTEGER) AS slice_nr, pf AS value,
           |       2 AS total_nr_frames, 3 AS total_nr_slices
           |FROM r WHERE n >= 6 AND rn < 6
           |ORDER BY l_orderkey, frame_nr, slice_nr""".stripMargin)) { (s, d) =>
    val t = orderTensors(s, d)
      .filter(size(col("data")) >= 6)
      .select(col("l_orderkey"),
        Tensors.tensor(typedLit(Seq(2, 3, 1, 1, 1)), slice(col("data"), 1, 6)).as("t"))
    Tensors.explodeTo2d(t, "t")
      .select(col("l_orderkey"), col("frame_nr"), col("slice_nr"),
        element_at(col("t.data"), 1).as("value"),
        col("total_nr_frames"), col("total_nr_slices"))
      .orderBy("l_orderkey", "frame_nr", "slice_nr")
  }

  // ---------------------------------------------------------------- Q45
  /** The pipeline layer under the oracle gate: the REAL cachePlan →
    * servePlan chain (ensure5d → BufferStats meta → min-shift → explode →
    * identity warp → saved-stats standardize) over per-order (2,2,1,2,1)
    * tensors. Round 4 broke exactly this path while the oracle stayed
    * green, because every declared query routed around the kernels; this
    * query makes the driver's correctness gate cover the ETL surface.
    * Arithmetic is float32-bit-exact on both sides (same pattern as q10/
    * q40: cents → float, one double op per step, cast back to float). */
  val q45 = DeclaredQuery(
    "q45_cache_serve",
    Some("""WITH f AS (
           |  SELECT l_orderkey,
           |         CAST(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE)/1e2 AS FLOAT) AS pf,
           |         row_number() OVER (PARTITION BY l_orderkey
           |           ORDER BY CAST(ROUND(l_extendedprice*100) AS BIGINT)) - 1 AS rn,
           |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n
           |  FROM lineitem),
           |t AS (SELECT l_orderkey, pf, rn FROM f WHERE n >= 8 AND rn < 8),
           |s AS (SELECT l_orderkey,
           |             MIN(CAST(pf AS DOUBLE)) AS mn,
           |             SUM(CAST(pf AS DOUBLE))/8 AS mean,
           |             sqrt(greatest(SUM(CAST(pf AS DOUBLE)*CAST(pf AS DOUBLE))/8
           |                   - (SUM(CAST(pf AS DOUBLE))/8)*(SUM(CAST(pf AS DOUBLE))/8), 0.0)) AS std
           |      FROM t GROUP BY l_orderkey),
           |c AS (SELECT t.l_orderkey, t.rn,
           |             CAST((CAST(t.pf AS DOUBLE) - s.mn) * 1.0 AS FLOAT) AS cf,
           |             s.mean - s.mn AS mean_sh, s.std AS std
           |      FROM t JOIN s USING (l_orderkey)),
           |z AS (SELECT l_orderkey, rn,
           |             CASE WHEN std > 0 THEN CAST((CAST(cf AS DOUBLE) - mean_sh) * (1.0/std) AS FLOAT)
           |                  ELSE CAST(0.0 AS FLOAT) END AS cs
           |      FROM c)
           |SELECT l_orderkey,
           |       CAST(rn // 4 AS INTEGER) AS frame_nr,
           |       CAST((rn // 2) % 2 AS INTEGER) AS slice_nr,
           |       MAX(CASE WHEN rn % 2 = 0 THEN cs END) AS v1,
           |       MAX(CASE WHEN rn % 2 = 1 THEN cs END) AS v2
           |FROM z GROUP BY 1, 2, 3
           |ORDER BY l_orderkey, frame_nr, slice_nr""".stripMargin)) { (s, d) =>
    import graft.pipeline.{GraftConfig, NormalizeConfig, TransformPlanner}
    val cfg = GraftConfig(
      datasetNames = Seq("synth"), keyPairs = Map("image" -> "none"),
      dimensionality = "2D", targetSize = (2, 1),
      normalize = NormalizeConfig(mode = "standardize", referenceLevel = "saved"))
    val recs = orderTensors(s, d)
      .filter(size(col("data")) >= 8)
      .select(col("l_orderkey"),
        Tensors.tensor(typedLit(Seq(2, 2, 1, 2, 1)), slice(col("data"), 1, 8)).as("image"))
    val cached = TransformPlanner.cachePlan(cfg, Seq("image"), Nil)(recs)
    val served = TransformPlanner.servePlan(cfg, Seq("image"), Nil,
      keyCol = "l_orderkey", augmented = false)(cached)
    served.select(col("l_orderkey"), col("frame_nr"), col("slice_nr"),
      element_at(col("image.data"), 1).as("v1"),
      element_at(col("image.data"), 2).as("v2"))
      .orderBy("l_orderkey", "frame_nr", "slice_nr")
  }

  // ---------------------------------------------------------------- Q46
  /** The predict-stage INVERSE path under the oracle gate (the last
    * pipeline layer q45 left uncovered): records carry a recorded
    * `_affine`, are warped through the REAL serve-side kernel
    * ([[graft.tensor.Kernels.affineResample]], bilinear, to a smaller
    * target geometry), then inverse-warped back to source geometry by the
    * REAL `Predictor.invertPredictions` → `TransformPlanner.inversePlan` →
    * `Kernels.invertAffine` chain.
    *
    * The affine is an exactly-invertible integer shift that varies per
    * order (dx = k mod 2, dy = [k mod 4 ≥ 2]), so bilinear weights
    * collapse to {0,1} and DuckDB can replay the round trip exactly:
    * source (2,4) → target (2,2) keeps src(y, x) for x ∈ [dx+1, dx+2]
    * (the centering offset cx−ocx = 1 plus the shift), y ≥ dy; the
    * inverse restores those pixels in place and zero-fills the rest.
    * A sign error in invertAffine or a centering error in the warp moves
    * the surviving window and fails the hash. */
  val q46 = DeclaredQuery(
    "q46_predict_invert",
    Some("""WITH f AS (
           |  SELECT l_orderkey,
           |         CAST(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE)/1e2 AS FLOAT) AS pf,
           |         row_number() OVER (PARTITION BY l_orderkey
           |           ORDER BY CAST(ROUND(l_extendedprice*100) AS BIGINT)) - 1 AS rn,
           |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n
           |  FROM lineitem),
           |t AS (SELECT l_orderkey, pf, rn FROM f WHERE n >= 8 AND rn < 8),
           |g AS (SELECT l_orderkey, pf,
           |             CAST(rn // 4 AS INTEGER) AS row_nr,
           |             CAST(rn % 4 AS INTEGER) AS col_nr,
           |             CAST(l_orderkey % 2 AS INTEGER) AS dx,
           |             CASE WHEN l_orderkey % 4 >= 2 THEN 1 ELSE 0 END AS dy
           |      FROM t)
           |SELECT l_orderkey, row_nr, col_nr,
           |       CASE WHEN row_nr >= dy AND col_nr >= dx + 1 AND col_nr <= dx + 2
           |            THEN pf ELSE CAST(0.0 AS FLOAT) END AS v
           |FROM g ORDER BY l_orderkey, row_nr, col_nr""".stripMargin)) { (s, d) =>
    import graft.pipeline.Predictor
    import graft.tensor.Kernels
    val dx = (col("l_orderkey") % 2).cast("double")
    val dy = ((col("l_orderkey") % 4) >= 2).cast("int").cast("double")
    val recs = orderTensors(s, d)
      .filter(size(col("data")) >= 8)
      .select(col("l_orderkey"),
        Tensors.tensor(typedLit(Seq(1, 1, 1, 2, 4)), slice(col("data"), 1, 8)).as("prediction"),
        array(lit(1.0), lit(0.0), dx, lit(0.0), lit(1.0), dy).as("_affine"))
    // forward: the serve-side warp kernel at serve geometry (2,2)
    val fw = Kernels.affineResample(col("prediction.shape"), col("prediction.data"),
      col("_affine"), lit(2), lit(2), lit(true))
    val scored = recs.withColumn("prediction",
      struct(fw("_1").as("shape"), fw("_2").as("data")))
    // inverse: the real predict chain back to source geometry (2,4)
    val inverted = Predictor.invertPredictions(scored, sourceH = 2, sourceW = 4)
    inverted
      .select(col("l_orderkey"), posexplode(col("prediction.data")))
      .select(col("l_orderkey"),
        expr("pos DIV 4").cast("int").as("row_nr"),
        (col("pos") % 4).cast("int").as("col_nr"),
        col("col").as("v"))
      .orderBy("l_orderkey", "row_nr", "col_nr")
  }

  val all: Seq[DeclaredQuery] = Seq(q40, q41, q45, q46)
}
