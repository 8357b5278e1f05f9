package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group aggregate — the scale-correct replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` when the group
  * count is small (skewed window: a handful of partitions each sorting a
  * corpus-sized slice on one task).
  *
  * The reference exposes ranking through pandas `groupby.head`
  * (`/root/reference/src/qcardia_data/utils/data_exploration.py` summary
  * tables); at 100 TB the equivalent must aggregate, not sort: this
  * Aggregator keeps the k smallest values seen, O(k) state, commutative +
  * associative merge → map-side partial aggregation. The shuffle carries
  * one ≤k-long array per (partition, group), never the group's rows — per
  * executor the group's corpus-sized slice reduces locally before a single
  * k-element merge tree on the reducer.
  *
  * Values are caller-packed sort keys: descending metrics pack as
  * `(CAP - metric) * 2^32 + id` so ascending-Long order IS the desired
  * (metric DESC, id ASC) order and ties are impossible by construction
  * (ids unique). Insert is binary-search + shift on a sorted primitive
  * array — k ≤ a few hundred keeps it a cache line or two.
  */
object TopK {

  /** Sorted-ascending distinct bottom-k of packed longs. */
  private final class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0 && k <= 4096, s"bottom-k bound out of range: $k")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v, k)

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `TopK.bottomK(5)(packedCol)` → array of the 5 smallest
    * packed values in ascending (= rank) order. */
  def bottomK(k: Int)(v: Column): Column = udaf(new BottomK(k)).apply(v)

  /** The single insertion law both the batch Aggregator and the streaming
    * twin ([[graft.streaming.StreamingOps.topkStream]]) apply: sorted
    * distinct bottom-k, binary-search + shift, duplicates dropped. Shared
    * so stream-vs-batch parity is by construction, not by coincidence. */
  private[graft] def insert(b: Array[Long], v: Long, k: Int): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, v)
    if (i >= 0) b // packed keys are unique by construction; drop repeats
    else {
      val ins = -i - 1
      if (b.length >= k && ins >= k) b
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        if (ins < n - 1) System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }
}
