package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch — the oracle-decidable
  * replacement for the HLL posture q23 carried through rounds 1–8.
  *
  * Spark's `approx_count_distinct` (HLL++) is deliberately NOT comparable
  * across engines: sketch layout, hash function and bias tables are
  * implementation details. KMV (Bar-Yossef et al. 2002; Beyer et al.,
  * SIGMOD'07 "On synopses for distinct value estimation under multiset
  * operations") has the property HLL lacks: given a shared deterministic
  * hash, the sketch state — the k smallest distinct hash values — is
  * engine-independent, so the estimate `(k-1) · 2^60 / h_(k)` is
  * replayable in DuckDB from `md5` string arithmetic alone.
  *
  * The input is a 60-bit uniform hash (first 15 hex chars of an md5 —
  * see the q23 builder). Estimator: with U = h_(k)/2^60 the k-th smallest
  * of n distinct uniform draws, E[U] ≈ k/(n+1), so (k-1)/U is the
  * standard unbiased KMV estimate; when fewer than k distinct hashes
  * exist the sketch IS the value set and the exact count is returned.
  *
  * Scale posture: O(k) state per group, commutative + associative merge →
  * map-side partial aggregation; the shuffle carries one ≤k-long array
  * per (partition, group), never the values. Insert is binary-search +
  * shift on a sorted primitive array (k = 64 → a cache line or two).
  */
object KmvSketch {

  val K = 64
  private val Pow60 = (1L << 60).toDouble

  final case class Out(estimate: Double, support: Long)

  /** Buffer: sorted ascending, distinct, at most K values. */
  private object Agg extends Aggregator[Long, Array[Long], Out] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], v: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, v)
      if (i >= 0) b // already present
      else {
        val ins = -i - 1
        if (b.length >= K && ins >= K) b // not among the k smallest
        else {
          val n = math.min(b.length + 1, K)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = v
          if (ins < n - 1) System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the K smallest distinct
      val out = new Array[Long](math.min(a.length + b.length, K))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(b: Array[Long]): Out =
      if (b.length < K) Out(b.length.toDouble, b.length.toLong)
      else Out((K - 1).toDouble * Pow60 / b(K - 1).toDouble, K.toLong)

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Column form: `KmvSketch(hash60col)` → struct(estimate, support). */
  def apply(hv: Column): Column = udaf(Agg).apply(hv)

  /** State-output form: the sorted ≤K-array of k-minimum hash values
    * itself, for PRE-AGGREGATED sketch stores (q99's per-day states).
    * The KMV closure property makes this the mergeable unit: the k-min
    * of a union equals the k-min of the union of per-part k-mins, so a
    * day-keyed state table answers any day-window distinct query by
    * re-sketching ≤ window·K values — without rescanning raw data. */
  private object StateAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Agg.zero
    def reduce(b: Array[Long], v: Long): Array[Long] = Agg.reduce(b, v)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = Agg.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def state(hv: Column): Column = udaf(StateAgg).apply(hv)

  /** The single insertion law behind both aggregators and the streaming
    * day-state maintainer ([[graft.streaming.StreamingOps.wauStream]]) —
    * shared so stream-vs-batch state parity is by construction. */
  private[graft] def insert(b: Array[Long], v: Long): Array[Long] =
    Agg.reduce(b, v)

  /** Estimate from a raw state array — [[Out]]'s law, for callers that
    * store states (q99's pattern) and finish later. */
  def estimateOf(b: Array[Long]): Double =
    if (b.length < K) b.length.toDouble
    else (K - 1).toDouble * Pow60 / b(K - 1).toDouble
}
