package graft.tools

import graft.pipeline._
import graft.tensor.Tensors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Throughput analog of the reference's cache-materialization run
  * (BASELINE.md: 370 subjects in 8:49 ≈ 0.70 subj/s with 4 workers,
  * `demo/demo.ipynb` cell 6): synthesize N subjects of (T,D,1,H,W) cine
  * volumes, run the full cache plan (ensure5d → min-shift → stats meta →
  * explode to 2-D → fingerprint → partitioned-parquet materialize), report
  * subjects/s as one JSON line.
  *
  * Run: SPARK_GRAFT_SUBJECTS=370 SPARK_GRAFT_CPUS=4 sbt 'runMain graft.tools.CacheBench'
  * (4 cpus mirrors the reference's num_workers: 4.)
  * SPARK_GRAFT_RES picks the in-plane resolution: 256 = the reference's
  * native geometry (the honest apples-to-apples anchor), 64 = 1/16 pixel
  * count for quick iteration.
  */
object CacheBench {
  def main(args: Array[String]): Unit = {
    val subjects = sys.env.getOrElse("SPARK_GRAFT_SUBJECTS", "370").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val res = sys.env.getOrElse("SPARK_GRAFT_RES", "64").toInt
    val (t, d, h, w) = (25, 12, res, res) // reference cine geometry: res=256 native
    val spark = graft.Session.local(cpus, "graft-cachebench")
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GraftConfig(datasetNames = Seq("synth"),
      keyPairs = Map("image" -> "label"), dimensionality = "2D")
    val n = t * d * h * w
    // synth volumes via a primitive-loop UDF (an interpreted HOF over 10⁶
    // elements would dominate the staging time)
    val gen = org.apache.spark.sql.functions.udf((id: Long, classes: Int) => {
      val a = new Array[Float](n)
      var i = 0
      while (i < a.length) {
        a(i) = if (classes > 0) (i % classes).toFloat
        else ((i * 2654435761L + id * 97) % 1024).toFloat
        i += 1
      }
      a.toSeq
    })
    val records = spark.range(subjects).select(
      concat(lit("s"), col("id")).as("subject_id"),
      lit("synth").as("dataset"),
      Tensors.tensor(typedLit(Seq(t, d, 1, h, w)), gen(col("id"), lit(0))).as("image"),
      Tensors.tensor(typedLit(Seq(t, d, 1, h, w)), gen(col("id"), lit(4))).as("label"))

    val root = Files.createTempDirectory("graft-cachebench").toString
    // stage the raw subject volumes to parquet UNTIMED — the reference's
    // 0.70 subj/s clock starts from reformatted volumes already on disk
    records.write.parquet(s"$root/raw")
    graft.Session.wideRows(spark, batch = if (res >= 128) 2 else 8)
    val raw = spark.read.parquet(s"$root/raw")
    val subjDf = raw.select("subject_id")
    val t0 = System.nanoTime()
    val cached = TransformPlanner.cachePlan(cfg, Seq("image"), Seq("label"))(raw)
    val path = DatasetCacher.materialize(spark, cached,
      Seq("subject_id", "dataset", "frame_nr", "slice_nr"),
      root, cfg, subjDf, "subject_id")
    val nRecords = DatasetCacher.load(spark, path).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = subjects / secs
    println(s"""{"metric":"cache_subjects_per_sec","value":$rate,"unit":"subj/sec","subjects":$subjects,"records":$nRecords,"seconds":$secs,"cpus":$cpus,"res":$res,"reference_anchor":0.70}""")
    spark.stop()
  }
}
