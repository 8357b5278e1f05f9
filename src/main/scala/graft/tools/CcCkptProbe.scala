package graft.tools

import graft.Session
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Measures the local-mode cost of the RELIABLE CC checkpoint path
  * (VERDICT r14 item 4) so the tradeoff in
  * [[graft.operators.ConnectedComponents]]'s `ckpt` scaladoc is a
  * number, not a guess: same graph, same arm, `spark.graft.cc.checkpoint`
  * local vs reliable (tmp checkpoint dir), wall seconds each.
  *
  * Usage: runMain graft.tools.CcCkptProbe [nVertices] [starSize]
  * Graph: star blocks of `starSize` chained by one bridge edge each —
  * the band-star-plus-depth topology the dedup chain produces.
  */
object CcCkptProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val star = if (args.length > 1) args(1).toLong else 16L
    val spark = Session.local(appName = "graft-cc-ckpt-probe")
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = java.nio.file.Files.createTempDirectory("graft-cc-probe")
    spark.sparkContext.setCheckpointDir(ckDir.toString)
    val verts = spark.range(n).select(col("id"))
    // star edges inside each block + a bridge to the previous block
    val starEdges = spark.range(n).filter(col("id") % star =!= 0)
      .select((col("id") - col("id") % star).as("a"), col("id").as("c"))
    val bridges = spark.range(n).filter(col("id") % star === 0 && col("id") > 0)
      .select((col("id") - star).as("a"), col("id").as("c"))
    val edges = starEdges.unionByName(bridges)
    val sym = edges.select(col("a").as("x"), col("c").as("nb"))
      .unionByName(edges.select(col("c").as("x"), col("a").as("nb")))
      .persist()
    sym.count()
    def run(mode: String): Double = {
      spark.conf.set("spark.graft.cc.checkpoint", mode)
      val t0 = System.nanoTime()
      val (labels, rounds) =
        ConnectedComponents.minLabel(verts, "id", sym, "x", "nb")
      val nz = labels.filter(col("cluster_id") =!= 0L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(nz == 0, s"$mode: expected one component labeled 0, $nz off")
      println(f"[cc-probe] mode=$mode%-8s rounds=$rounds wall=$secs%.2f s")
      secs
    }
    // warmup evens out JIT/codegen between the two timed arms
    run("local")
    val l = run("local")
    val r = run("reliable")
    println(f"[cc-probe] reliable/local = ${r / l}%.2fx (n=$n, star=$star)")
    spark.stop()
  }
}
