package graft.pipeline

import graft.Tables
import graft.queries.{AnnKernels, AnnServing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index lifecycle — the production complement to
  * `queries/AnnServing`'s in-query paths: TRAIN ONCE, SERVE MANY. The
  * declared q55/q56 and the AnnServing measurement paths train their
  * codebook inside every query (oracle/measurement contract);
  * BASELINE.md notes that a composed pipeline must not. This is that
  * composition:
  *
  *   - [[build]] trains the coarse quantizer + PQ codebook and
  *     materializes three parquet artifacts under `indexDir`:
  *     `centroids` (nClusters rows), `codebook` (m·k rows), and `codes`
  *     (one row per (vector, subspace), PARTITIONED BY cell id — so a
  *     probe's cell restriction is physical partition PRUNING at read
  *     time, the property the 100 TB layout depends on);
  *   - [[search]] reads only the tiny artifacts plus the probed cells'
  *     code partitions, runs the ADC shortlist, and reranks exactly
  *     against the raw vectors of the shortlist only.
  *
  * Index artifacts are plain parquet: an ingest increment appends new
  * vectors' codes to their cell partitions (dynamic partition overwrite
  * or append) without touching the trained quantizers — retraining
  * cadence is a deployment choice, not a per-batch cost.
  */
object AnnIndex {

  /** nClusters <= 0 means SELF-SIZED: nlist ≈ √n (the FAISS IVF practice
    * and the q57 self-sized-planes pattern — a fixed cell count that is
    * right at one corpus size is wrong at 100× it; the round-9 5M build
    * used 64 fixed cells = 78k vectors/cell and paid for it in recall).
    * √n balances the two serve-side costs: centroid scan (nlist) and
    * per-probed-cell work (n/nlist). */
  final case class Params(nClusters: Int = 0, m: Int = 8, k: Int = 256,
                          iters: Int = 4)

  /** clamp keeps degenerate corpora sane: >=16 so tiny test corpora still
    * exercise multi-cell pruning, <=65536 so the centroid frame stays a
    * broadcast-sized artifact (64k × 64-dim doubles ≈ 34 MB ceiling). */
  def sizedClusters(n: Long): Int =
    math.max(16, math.min(65536, math.round(math.sqrt(n.toDouble)).toInt))

  /** Train quantizers on the corpus at `dataDir` and materialize the
    * index under `indexDir`. */
  def build(s: SparkSession, dataDir: String, indexDir: String,
            p: Params = Params()): Unit =
    buildOf(s, Tables.embeddings(s, dataDir), indexDir, p)

  /** [[build]] over an embeddings FRAME (vec_id, embedding) — the entry
    * point for corpora that are not the sfDir table (scale runs, filtered
    * bases for append experiments).
    *
    * Assignment steps run the [[AnnKernels]] JVM twins of AnnServing's
    * expression shapes: the expression argmin (`min(struct(...))` over a
    * crossJoin/broadcast-join candidate frame) sorts n×k interpreted-HOF
    * rows — 10^10 for a 5M-vector 8×256 build — where the kernel is
    * k×dim multiply-adds per input row with no candidate frame at all.
    * Parity is spec-pinned (AnnServingSpec). */
  def buildOf(s: SparkSession, emb: DataFrame, indexDir: String,
              p: Params = Params()): Unit = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val nClusters =
      if (p.nClusters > 0) p.nClusters else sizedClusters(e.count())
    // coarse quantizer: seeded picks + one mean refinement (AnnServing's
    // ivf recipe); collected literal frames keep every join a broadcast
    val cent0 = AnnServing.seedPick(s, e, nClusters, "centroid")
      .select(col("pick_id").as("cluster_id"), col("v").as("cv"))
      .withColumn("cnrm",
        sqrt(aggregate(transform(col("cv"), x => x * x), lit(0.0), (a, x) => a + x)))
    def assignCell(c: DataFrame): DataFrame =
      AnnKernels.assignCellsJvm(e, AnnKernels.centArray(c))
    val meansPlan = assignCell(cent0).join(e, Seq("vec_id"))
      .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy("cluster_id", "pos").agg(avg(col("val")).as("mn"))
      .groupBy("cluster_id")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("mn")))),
        x => x("mn")).as("cv"))
      .withColumn("cnrm",
        sqrt(aggregate(transform(col("cv"), x => x * x), lit(0.0), (a, x) => a + x)))
    val cent = graft.util.Bounded.literalFrame(
      meansPlan, 65536, "index centroid frame")
    cent.write.mode("overwrite").parquet(s"$indexDir/centroids")
    val book = AnnServing.pqCodebookOf(s, emb, p.m, p.k, p.iters,
      jvmAssign = true)
    book.write.mode("overwrite").parquet(s"$indexDir/codebook")
    val codes = AnnKernels.assignCodesJvm(e, AnnKernels.bookArrays(book))
      .join(assignCell(cent), Seq("vec_id"))
    // repartition on the partition column before the dynamic write: with
    // a √n-sized nlist (thousands of cells) an unclustered write has every
    // task emitting a file into every cell directory — nlist × tasks tiny
    // files; clustering first gives one file per cell
    codes.repartition(col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$indexDir/codes")
  }

  /** Append an INCREMENT's codes to an existing index — the
    * "append-without-retrain" half of the lifecycle: the increment is
    * coded with the ALREADY-TRAINED quantizers (centroids + codebook read
    * back from the index, broadcast-sized) and its code rows land in their
    * cell partitions via parquet append. Nothing about the base corpus is
    * touched or re-read; retraining cadence stays a deployment choice.
    * Cost is O(increment): one cell assignment + one code assignment. */
  def append(s: SparkSession, emb: DataFrame, indexDir: String): Unit = {
    val cent = s.read.parquet(s"$indexDir/centroids")
    val book = s.read.parquet(s"$indexDir/codebook")
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val codes = AnnKernels.assignCodesJvm(e, AnnKernels.bookArrays(book))
      .join(AnnKernels.assignCellsJvm(e, AnnKernels.centArray(cent)),
        Seq("vec_id"))
    codes.repartition(col("cluster_id"))
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexDir/codes")
  }

  /** Top-k for the probe set (vec_id < 5 of `dataDir`, as everywhere)
    * against a prebuilt index: cells prune the code READ, ADC ranks the
    * shortlist, exact L2 reranks it. No training happens here. */
  def search(s: SparkSession, dataDir: String, indexDir: String,
             nprobe: Int = 4, shortlist: Int = 500, topK: Int = 5): DataFrame =
    searchOf(s, Tables.embeddings(s, dataDir), indexDir, nprobe, shortlist, topK)

  /** [[search]] over an embeddings FRAME (vec_id, embedding) supplying both
    * the probe set and the rerank raw vectors. */
  def searchOf(s: SparkSession, emb: DataFrame, indexDir: String,
             nprobe: Int = 4, shortlist: Int = 500, topK: Int = 5): DataFrame = {
    val cent = s.read.parquet(s"$indexDir/centroids")
    val book = s.read.parquet(s"$indexDir/codebook")
    val m = book.agg(max(col("sub"))).head().getInt(0) + 1
    val e = emb
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val dim = e.select(size(col("v"))).head().getInt(0)
    val probesBase = e.filter(col("vec_id") < 5)
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
    val probeCells = probesBase.crossJoin(broadcast(cent))
      .withColumn("csim",
        aggregate(zip_with(col("v"), col("cv"), (a, b) => a * b), lit(0.0), (a, x) => a + x)
          / (col("nrm") * col("cnrm")))
      .withColumn("ark", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cluster_id"))))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cluster_id"))
    // physical partition pruning taken one step further: with a √n-sized
    // index (thousands of cell dirs) even LISTING the full partition tree
    // costs more than the probed read, so the scan is given ONLY the
    // probed cells' directories (basePath keeps cluster_id a partition
    // column). An isin filter on a root read prunes which files are READ
    // but still discovers all of them; this prunes the discovery too —
    // O(nprobe × probes) dirs instead of O(nlist). Missing dirs (cells
    // that never received a vector) are skipped via one driver-side
    // existence check against the filesystem.
    val probedCellIds: Array[Any] = probeCells.select("cluster_id").distinct()
      .collect().map(_.get(0))
    val codesRoot = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = codesRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    val cellPaths = probedCellIds
      .map(id => new org.apache.hadoop.fs.Path(codesRoot, s"cluster_id=$id"))
      .filter(fs.exists)
      .map(_.toString)
    val codes =
      if (cellPaths.isEmpty)
        s.read.parquet(s"$indexDir/codes").filter(lit(false))
      else
        s.read.option("basePath", s"$indexDir/codes").parquet(cellPaths: _*)
          .filter(col("cluster_id").isin(probedCellIds: _*))
    val probeSubs = AnnServing.subvectors(probesBase.select(col("vec_id"), col("v")), m, dim / m)
      .select(col("vec_id").as("probe_id"), col("sub"), col("vs").as("ps"))
    val lut = probeSubs.join(broadcast(book), Seq("sub"))
      .select(col("probe_id"), col("sub"), col("code"),
        (aggregate(transform(col("ps"), x => x * x), lit(0.0), (a, x) => a + x)
          - lit(2) * aggregate(zip_with(col("ps"), col("cv"), (a, b) => a * b), lit(0.0), (a, x) => a + x)
          + aggregate(transform(col("cv"), x => x * x), lit(0.0), (a, x) => a + x)).as("pd"))
    val cand = codes.join(broadcast(probeCells), Seq("cluster_id"))
      .join(broadcast(lut), Seq("probe_id", "sub", "code"))
      .groupBy("probe_id", "vec_id")
      .agg(sum(col("pd")).as("adc_dist"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("adc_dist").asc, col("vec_id"))))
      .filter(col("rk") <= shortlist)
      .select(col("probe_id"), col("vec_id"))
    AnnServing.rerankExactOf(s, emb, cand, topK)
  }
}
