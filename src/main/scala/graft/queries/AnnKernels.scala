package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JVM twins of AnnServing's expression-shaped assignment steps, for the
  * PRODUCTION index paths (AnnIndex build/append, codebook training at
  * scale). Two scale pathologies force the object boundary here — the
  * same lesson as the streaming minhash (StreamingOps) 400× rework:
  *
  *   1. `min(struct(...))` argmin aggregation falls back to
  *      SortAggregate (struct buffers are not hash-agg mutable), so the
  *      n×k candidate frame — 10^10 rows for a 5M-vector 8×256 build —
  *      is SORTED, not hash-combined;
  *   2. `aggregate`/`zip_with` HOFs have no codegen (interpreted
  *      `eval`, per-element boxed getters) — tens of µs per candidate
  *      row (jstack-confirmed on the r9 5M build: ZipWith.eval under
  *      sort_addToSorter, ~60 µs/row).
  *
  * A tight JVM loop over a broadcast-sized quantizer array never
  * materializes the candidate frame at all: per input row it is
  * k×subDim multiply-adds in registers. The 5M×8×256 build drops from
  * >75 min (killed) to ~1 min of kernel time.
  *
  * ARITHMETIC PARITY with the expression shapes is load-bearing (the
  * declared q55/q56 keep the expression path for their DuckDB oracle;
  * the index must assign identically): every fold below replicates the
  * expression tree's evaluation order — sequential left folds for
  * norms/dots, `(vnn - 2·dot) + cnn` association for distances,
  * higher-sim/lower-id and lower-dist/lower-code tie rules matching
  * `min(struct(...))` lexicographics. AnnServingSpec pins kernel ==
  * expression on real corpus data.
  */
object AnnKernels {

  /** centroid frame (cluster_id, cv, cnrm) → local array sorted by id.
    * Bounded by construction: the coarse quantizer is ≤65536 cells
    * (AnnIndex.sizedClusters' clamp) — asserted here so a caller passing
    * a corpus-sized frame fails loudly instead of collecting it. */
  private[graft] def centArray(cent: DataFrame): Array[(Int, Array[Double], Double)] = {
    val rows = cent.select(col("cluster_id"), col("cv"), col("cnrm")).collect()
    require(rows.length <= 65536,
      s"centroid frame has ${rows.length} rows — a coarse quantizer is " +
        "broadcast-sized (<=65536); this looks like a corpus frame")
    rows.map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
  }

  /** best coarse cell per vector by cosine — JVM twin of the
    * crossJoin + min(struct(-csim, cluster_id)) shape. Input frame must
    * carry (vec_id, v: array&lt;double&gt;). */
  private[graft] def assignCellsJvm(
      e: DataFrame, cents: Array[(Int, Array[Double], Double)]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    // explicit broadcast, not closure capture: a √n-sized quantizer at 5M
    // vectors is ~2k cells × 64 dims ≈ 1 MB+ — shipped once per executor
    // via the broadcast store instead of serialized into every task
    val bc = s.sparkContext.broadcast(cents)
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])].mapPartitions { it =>
      val cents = bc.value
      it.map { case (id, v) =>
        var nn = 0.0
        var i = 0
        while (i < v.length) { nn += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(nn)
        var bestSim = Double.NegativeInfinity
        var bestId = Int.MaxValue
        var ci = 0
        while (ci < cents.length) {
          val c = cents(ci)
          val cv = c._2
          var d = 0.0
          var j = 0
          while (j < v.length) { d += v(j) * cv(j); j += 1 }
          val sim = d / (nrm * c._3)
          // min(struct(-csim, id)): higher sim wins, ties take lower id;
          // NaN sims (zero-norm degeneracies) never beat a real sim
          if (sim > bestSim || (sim == bestSim && c._1 < bestId)) {
            bestSim = sim; bestId = c._1
          }
          ci += 1
        }
        // all-NaN degenerate group: expression min lands on the lowest id
        if (bestId == Int.MaxValue && cents.nonEmpty) bestId = cents(0)._1
        (id, bestId)
      }
    }.toDF("vec_id", "cluster_id")
  }

  /** codebook frame (sub, code, cv) → per-sub candidate arrays
    * (code, cv, ||cv||²), codes ascending. Codes are int-valued (seeded
    * pick ids ≤ k) and the emitted column stays INT so the codes
    * artifact schema matches the expression path's. */
  private[graft] def bookArrays(book: DataFrame): Array[Array[(Int, Array[Double], Double)]] = {
    val collected = book.select(col("sub"), col("code").cast("int"), col("cv")).collect()
    // a PQ codebook is m·k rows (m<=64 subspaces × k<=65536 codes by any
    // sane parameterization) — corpus-sized inputs fail loudly
    require(collected.length <= (1 << 20),
      s"codebook frame has ${collected.length} rows — a PQ codebook is " +
        "m·k broadcast-sized; this looks like a corpus frame")
    val rows = collected
      .map { r =>
        val cv = r.getSeq[Double](2).toArray
        var nn = 0.0
        var i = 0
        while (i < cv.length) { nn += cv(i) * cv(i); i += 1 }
        (r.getInt(0), r.getInt(1), cv, nn)
      }
    val m = rows.map(_._1).max + 1
    (0 until m).map(sub =>
      rows.filter(_._1 == sub).map(t => (t._2, t._3, t._4)).sortBy(_._1)).toArray
  }

  /** nearest codeword per (vec, sub) — JVM twin of
    * [[AnnServing.assignCodes]] (broadcast-join + min(struct(dist, code))
    * shape). Input frame must carry (vec_id, v: array&lt;double&gt;);
    * emits (vec_id, sub, code). */
  private[graft] def assignCodesJvm(
      e: DataFrame, bySub: Array[Array[(Int, Array[Double], Double)]]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val m = bySub.length
    val bc = s.sparkContext.broadcast(bySub)
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])].mapPartitions { it =>
      val bySub = bc.value
      it.flatMap { case (id, v) =>
        val subDim = v.length / m
        (0 until m).iterator.map { sub =>
          val off = sub * subDim
          var vnn = 0.0
          var j = 0
          while (j < subDim) { val x = v(off + j); vnn += x * x; j += 1 }
          var bestDist = Double.PositiveInfinity
          var bestCode = Int.MaxValue
          val cands = bySub(sub)
          var bi = 0
          while (bi < cands.length) {
            val c = cands(bi)
            val cv = c._2
            var d = 0.0
            j = 0
            while (j < subDim) { d += v(off + j) * cv(j); j += 1 }
            // same association as the expression: (vnn - 2·dot) + cnn
            val dist = vnn - 2 * d + c._3
            if (dist < bestDist || (dist == bestDist && c._1 < bestCode)) {
              bestDist = dist; bestCode = c._1
            }
            bi += 1
          }
          if (bestCode == Int.MaxValue && cands.nonEmpty) bestCode = cands(0)._1
          (id, sub, bestCode)
        }
      }
    }.toDF("vec_id", "sub", "code")
  }
}
