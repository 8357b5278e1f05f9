package graft

import graft.operators.EnclosingCircle
import graft.operators.EnclosingCircle.Circle
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Welzl vs brute force: the minimal enclosing circle is unique; the O(n³)
  * candidate sweep (all diameter-pairs + all circumcircle-triples) is the
  * ground truth. */
class EnclosingCircleSpec extends AnyFunSuite {

  private def brute(points: Seq[(Double, Double)]): Circle = {
    val pts = points.distinct
    def covers(c: Circle): Boolean =
      pts.forall(p => math.hypot(p._1 - c.cx, p._2 - c.cy) <= c.r + 1e-9)
    def from2(a: (Double, Double), b: (Double, Double)) = {
      val cx = (a._1 + b._1) / 2; val cy = (a._2 + b._2) / 2
      Circle(cx, cy, math.hypot(a._1 - cx, a._2 - cy))
    }
    def from3(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Option[Circle] = {
      val d = 2.0 * (a._1 * (b._2 - c._2) + b._1 * (c._2 - a._2) + c._1 * (a._2 - b._2))
      if (math.abs(d) < 1e-12) None
      else {
        val ux = ((a._1 * a._1 + a._2 * a._2) * (b._2 - c._2) + (b._1 * b._1 + b._2 * b._2) * (c._2 - a._2) + (c._1 * c._1 + c._2 * c._2) * (a._2 - b._2)) / d
        val uy = ((a._1 * a._1 + a._2 * a._2) * (c._1 - b._1) + (b._1 * b._1 + b._2 * b._2) * (a._1 - c._1) + (c._1 * c._1 + c._2 * c._2) * (b._1 - a._1)) / d
        Some(Circle(ux, uy, math.hypot(a._1 - ux, a._2 - uy)))
      }
    }
    if (pts.isEmpty) return Circle(0, 0, 0)
    if (pts.size == 1) return Circle(pts.head._1, pts.head._2, 0)
    val cands =
      (for (i <- pts.indices; j <- i + 1 until pts.size) yield from2(pts(i), pts(j))) ++
        (for (i <- pts.indices; j <- i + 1 until pts.size; k <- j + 1 until pts.size;
              c <- from3(pts(i), pts(j), pts(k))) yield c)
    cands.filter(covers).minBy(_.r)
  }

  test("matches brute force on random point sets") {
    val rng = new Random(42)
    for (trial <- 1 to 20) {
      val n = 3 + rng.nextInt(20)
      val pts = Seq.fill(n)((rng.nextInt(50).toDouble, rng.nextInt(50).toDouble))
      val w = EnclosingCircle.welzl(pts)
      val b = brute(pts)
      assert(math.abs(w.r - b.r) < 1e-6, s"trial $trial: welzl r=${w.r} brute r=${b.r} pts=$pts")
      assert(math.hypot(w.cx - b.cx, w.cy - b.cy) < 1e-6, s"trial $trial center mismatch")
    }
  }

  test("degenerate inputs") {
    assert(EnclosingCircle.welzl(Nil) == Circle(0, 0, 0))
    assert(EnclosingCircle.welzl(Seq((3.0, 4.0))) == Circle(3.0, 4.0, 0.0))
    val two = EnclosingCircle.welzl(Seq((0.0, 0.0), (2.0, 0.0)))
    assert(math.abs(two.cx - 1.0) < 1e-12 && math.abs(two.r - 1.0) < 1e-12)
    // collinear
    val col = EnclosingCircle.welzl(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0)))
    assert(math.abs(col.r - math.hypot(1.5, 1.5)) < 1e-9)
  }

  test("order invariance (merge-safety analog)") {
    val rng = new Random(7)
    val pts = Seq.fill(30)((rng.nextDouble() * 100, rng.nextDouble() * 100))
    val a = EnclosingCircle.welzl(pts)
    val b = EnclosingCircle.welzl(rng.shuffle(pts))
    assert(math.abs(a.r - b.r) < 1e-9 && math.hypot(a.cx - b.cx, a.cy - b.cy) < 1e-9)
  }
}
