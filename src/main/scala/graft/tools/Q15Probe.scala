package graft.tools
object Q15Probe {
  def main(args: Array[String]): Unit = {
    val pts = for (x <- 0 until 97; y <- 0 until 89) yield (x.toDouble, y.toDouble)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    t("welzl 8633 lattice warm")(graft.operators.EnclosingCircle.welzl(pts))
    val c1 = t("welzl 8633 lattice")(graft.operators.EnclosingCircle.welzl(pts))
    println(c1)
    val c2 = t("welzl again")(graft.operators.EnclosingCircle.welzl(pts))
    println(c2)
  }
}
