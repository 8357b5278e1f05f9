package graft.tools

import graft.tensor.Kernels
import org.apache.spark.sql.functions._

/** Serve-path warp throughput anchor: bilinear affineResample over
  * native-geometry (25×256²) cine stacks at local[4] — the per-epoch
  * augment cost the dataloader pays per record. Round-6 history: the
  * boxed Seq[Float] UDF boundary ran 168 frames/s; primitive
  * Array[Float] runs ~970 (5.8×) — the warp reads each source sample up
  * to 4×, so boxed access dominated the kernel itself.
  *
  * Run: `sbt 'runMain graft.tools.WarpBench'` → one line.
  */
object WarpBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(4, "warpbench")
    spark.sparkContext.setLogLevel("ERROR")
    val n = 25 * 256 * 256
    val gen = udf((id: Long) => Array.tabulate(n)(i => ((i * 31 + id) % 1024).toFloat))
    val df = spark.range(64).select(col("id"),
      typedLit(Seq(25, 1, 1, 256, 256)).as("shape"), gen(col("id")).as("data"))
      .persist()
    df.count()
    val m = typedLit(Seq(0.98, 0.05, 1.5, -0.05, 0.98, 0.7))
    def run(): Double = {
      val t0 = System.nanoTime()
      val w = Kernels.affineResample(col("shape"), col("data"), m, lit(256), lit(256), lit(true))
      df.select(sum(element_at(w("_2"), 1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val secs = (1 to 3).map(_ => run()).min
    println(f"""{"metric":"warp_frames_per_sec","value":${64 * 25 / secs}%.0f,"unit":"frames/s","cpus":4,"geometry":"25x256x256"}""")
    spark.stop()
  }
}
