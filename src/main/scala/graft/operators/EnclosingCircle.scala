package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Smallest enclosing circle of a 2-D point set — the one genuinely custom
  * aggregate in the reference (Welzl via the `smallestenclosingcircle` dep,
  * `/root/reference/src/qcardia_data/pipeline/transforms/utils.py:129-134`,
  * `pyproject.toml:13`).
  *
  * Implemented as a typed `Aggregator` (merge-safe, partial-aggregation
  * friendly): the buffer collects deduplicated points (label-pixel sets per
  * group are small — SURVEY §7.4.3), `finish` runs Welzl's algorithm over a
  * deterministic md5-shuffled order (expected linear time, order fixed so
  * results are partition-invariant).
  */
object EnclosingCircle {

  final case class Circle(cx: Double, cy: Double, r: Double)

  /** Deterministic Welzl: move-to-front over an md5-keyed order. */
  def welzl(points: Seq[(Double, Double)]): Circle = {
    val pts = points.distinct.sortBy { case (x, y) =>
      new String(java.security.MessageDigest.getInstance("MD5")
        .digest(s"$x,$y".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }.toArray
    if (pts.isEmpty) return Circle(0.0, 0.0, 0.0)

    def circleFrom2(a: (Double, Double), b: (Double, Double)): Circle = {
      val cx = (a._1 + b._1) / 2.0; val cy = (a._2 + b._2) / 2.0
      Circle(cx, cy, math.hypot(a._1 - cx, a._2 - cy))
    }
    def circleFrom3(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Option[Circle] = {
      val ax = a._1; val ay = a._2; val bx = b._1; val by = b._2; val cx = c._1; val cy = c._2
      val d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      if (math.abs(d) < 1e-12) None
      else {
        val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
        val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
        Some(Circle(ux, uy, math.hypot(ax - ux, ay - uy)))
      }
    }
    // squared-distance form of `hypot(dx,dy) <= r·(1+1e-12)+1e-12`: both
    // sides are non-negative so squaring preserves the predicate, and it
    // removes a sqrt from the innermost rebuild loops (r17: q15's cost
    // was ~1 s of hypot calls per 8.6k-point lattice, not the encoder
    // boundary the r16 verdict guessed)
    def contains(c: Circle, p: (Double, Double)): Boolean = {
      val dx = p._1 - c.cx; val dy = p._2 - c.cy
      val bound = c.r * (1.0 + 1e-12) + 1e-12
      dx * dx + dy * dy <= bound * bound
    }

    var c = Circle(pts(0)._1, pts(0)._2, 0.0)
    for (i <- 1 until pts.length) if (!contains(c, pts(i))) {
      // new circle must have pts(i) on its boundary
      c = Circle(pts(i)._1, pts(i)._2, 0.0)
      for (j <- 0 until i) if (!contains(c, pts(j))) {
        c = circleFrom2(pts(i), pts(j))
        for (k <- 0 until j) if (!contains(c, pts(k))) {
          c = circleFrom3(pts(i), pts(j), pts(k)).getOrElse(c)
        }
      }
    }
    c
  }

  private object Agg extends Aggregator[(Double, Double), ArrayBuffer[(Double, Double)], Circle] {
    // Hash-based dedup, amortized O(1) per point: append freely, collapse
    // duplicates whenever the buffer length hits a power of two (so total
    // dedup work is O(n)), and always on merge/finish. A per-append
    // `b.contains` would be O(n²) per group — fatal on raw pixel coords.
    private def dedup(b: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
      val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
      b.filter(seen.add)
    }
    def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[(Double, Double)], p: (Double, Double)): ArrayBuffer[(Double, Double)] = {
      b += p
      if (b.length >= 1024 && (b.length & (b.length - 1)) == 0) dedup(b) else b
    }
    def merge(a: ArrayBuffer[(Double, Double)], b: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] =
      dedup(a ++= b)
    def finish(b: ArrayBuffer[(Double, Double)]): Circle = welzl(dedup(b).toSeq)
    def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Circle] = Encoders.product[Circle]
  }

  /** SQL-callable form: enclosingCircle(x, y) → struct(cx, cy, r). */
  def apply(x: Column, y: Column): Column = udaf(Agg).apply(x, y)
}
