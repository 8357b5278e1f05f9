package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for q32's position-weighted rolling fingerprint
  * Σ_{i=1..numChars} codepoint(c_i)·(i²+7) mod 1e9+7.
  *
  * Why (r18, guide §1.2 "per-task work" / SURVEY §7.3 preference order):
  * the HOF form `aggregate(sequence(1, length(text)), ..., acc +
  * ascii(substring(text, i, 1)) * (i*i+7))` is QUADRATIC in document
  * length — `Substring` calls `UTF8String.substringSQL(i, 1)`, which walks
  * the string from byte 0 counting code points on EVERY call, and
  * `sequence` additionally materializes a length-n array per row. This
  * expression is one linear pass per document with no allocation beyond
  * the single `toString`.
  *
  * Semantics are EXACTLY the HOF's (spec-pinned in TextKernelsSpec against
  * the original expression on adversarial unicode):
  *  - iteration is CODE-POINT indexed, 1-based — `length`/`substring`
  *    count code points, and `Ascii.nullSafeEval` returns
  *    `str.toString.codePointAt(0)` (verified against the Spark 4.1.2
  *    catalyst bytecode), so astral-plane characters contribute their full
  *    code point once, exactly like the HOF;
  *  - empty string → 0 (the HOF's descending `sequence(1,0)` probes yield
  *    `ascii('') = 0`), NULL → NULL (nullIntolerant);
  *  - accumulation is java-long arithmetic; the HOF under ANSI would
  *    throw on long overflow where this wraps, but overflow needs a
  *    single document of ≳6·10⁵ chars (Σ cp·i² ≈ 100·n³/3 vs 2⁶³) —
  *    far beyond every declared corpus, and the oracle gate would catch
  *    a divergence loudly.
  */
object TextKernels {
  def rollingFp(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    var acc = 0L
    var idx = 0
    var k = 1L
    while (idx < len) {
      val cp = str.codePointAt(idx)
      acc += cp.toLong * (k * k + 7L)
      idx += Character.charCount(cp)
      k += 1
    }
    acc % 1000000007L
  }
}

/** Per-document n-gram repetition statistics for q59 — r18 (guide §2.3/
  * §2.4): the fractions depend ONLY on the row's own token array, so the
  * explode → two corpus-sized (doc_id, gram) hash-aggs → merge-back plan
  * shuffled gram strings for a value each task could compute locally.
  * This kernel computes both fractions in one pass per row: zero
  * exchanges (the declared ORDER BY aside), embarrassingly parallel at
  * any scale.
  *
  * Exact semantics of the replaced plan (spec-pinned in TextKernelsSpec
  * against the original explode/agg formulation):
  *  - top_bigram_frac = 2.0 · max bigram count / n  (0.0 when n < 2)
  *  - dup_trigram_frac = Σ c>1 counts / Σ counts     (0.0 when n < 3)
  * with the same double expression trees (2.0·max first, then divide;
  * integer sums cast to double, then divide); grams compare as their
  * space-joined strings, exactly `concat_ws(' ', ...)` equality (tokens
  * are split on ' ' so the join is injective). NULL token array → NULL
  * struct (callers coalesce to 0.0 exactly like the old left joins).
  *
  * CodegenFallback is fine here (the BufferStats precedent): one eval
  * per row with a primitive loop inside, not per-element interpretation.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var top = 0.0
    var dup = 0.0
    if (n >= 2) {
      val toks = new Array[String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
      val m2 = new java.util.HashMap[String, Int]((n * 2) max 16)
      i = 0
      while (i < n - 1) {
        m2.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        i += 1
      }
      var mx = 0
      val it2 = m2.values().iterator()
      while (it2.hasNext) { val c = it2.next(); if (c > mx) mx = c }
      top = 2.0 * mx.toDouble / n.toDouble
      if (n >= 3) {
        val m3 = new java.util.HashMap[String, Int]((n * 2) max 16)
        i = 0
        while (i < n - 2) {
          m3.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, (a, b) => a + b)
          i += 1
        }
        var dupSum = 0L
        var tot = 0L
        val it3 = m3.values().iterator()
        while (it3.hasNext) {
          val c = it3.next()
          tot += c
          if (c > 1) dupSum += c
        }
        dup = dupSum.toDouble / tot.toDouble
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(top, dup)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact length of the union of fixed-width integer intervals
  * [s, s+width-1] over the row's own span-start array — q66's per-doc
  * duplicate-token coverage, r18. Replaces the 8× position explode →
  * corpus-wide (doc, position) DISTINCT → per-doc count chain with one
  * sort + sweep per row: `COUNT(DISTINCT i+o, o ∈ [0,width))` over a
  * doc's spans IS the union length of its width-wide intervals. The
  * start list is bounded by the document's own token count (the same
  * bound as the token array itself), so unlike a per-GRAM list this
  * cannot hot-key at scale. NULL/empty array → 0 via the caller's
  * coalesce, matching the old left join.
  *
  * CodegenFallback: one eval per row, primitive sort + sweep inside
  * (BufferStats precedent). */
case class CoverageLen(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"coverage_len expects array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "coverage_len"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) 0L
    else {
      val starts = new Array[Long](n)
      var i = 0
      while (i < n) { starts(i) = arr.getLong(i); i += 1 }
      java.util.Arrays.sort(starts)
      var total = 0L
      var coveredTo = Long.MinValue // exclusive end of covered prefix
      i = 0
      while (i < n) {
        val s = starts(i)
        val e = s + width
        if (e > coveredTo) {
          total += e - math.max(s, coveredTo)
          coveredTo = e
        }
        i += 1
      }
      total
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** q112's gap-fill rollup computed from the user's OBSERVED hours only —
  * r18. The previous plan exploded each user's full hour span into grid
  * rows (span-sized, the query's sf10 cost), left-joined the hourly
  * frame back, ran a LOCF window, and re-aggregated. Every output is
  * derivable from the sorted (hour, cent) pairs alone:
  *   n_hours   = h_max − h_min + 1
  *   n_observed= count of non-NULL cents
  *   locf_sum  = Σ run_i · (h_{i+1} − h_i) + run_last · (h_max − h_last + 1)
  * where run is the last non-NULL cent at or before the segment start —
  * exactly `SUM(last(cent, ignoreNulls) OVER (... ROWS UNBOUNDED
  * PRECEDING))` over the grid, because filled is constant between
  * observed hours. cent·gap ≡ gap-fold addition mod 2⁶⁴, so the long
  * arithmetic matches the replaced window+sum bit-for-bit (no overflow
  * occurs on any gated corpus; the oracle would fail loudly otherwise).
  * Input pairs are one per DISTINCT observed hour of one user — bounded
  * by the user's event count, the same bound the old window partition
  * had. Returns struct(n_hours, n_observed, locf_cent_sum  — the last
  * NULL when no non-NULL cent exists, matching SUM over all-NULL).
  *
  * CodegenFallback: one eval per row, sort + sweep inside (BufferStats
  * precedent). */
case class LocfGridStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"locf_grid_stats expects array<struct<h:bigint,cent:bigint>>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_hours", LongType, nullable = false),
    StructField("n_observed", LongType, nullable = false),
    StructField("locf_cent_sum", LongType, nullable = true)))
  override def prettyName: String = "locf_grid_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    // contract (ADVICE r18): the child is a collect_list of non-null
    // struct elements over a grouped row, so it is never empty — and the
    // declared non-nullable n_hours/n_observed forbid returning null
    // here. A caller that feeds a nullable-element array must filter
    // first; failing loudly beats an optimizer-visible contract breach.
    require(n > 0,
      "locf_grid_stats over an empty array — caller must supply >= 1 pair");
    {
      val hs = new Array[Long](n)
      val cents = new Array[Long](n)
      val isNullCent = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        val st = arr.getStruct(i, 2)
        hs(i) = st.getLong(0)
        if (st.isNullAt(1)) isNullCent(i) = true else cents(i) = st.getLong(1)
        i += 1
      }
      // sort the three parallel arrays by hour (hours are distinct per user)
      val idx = Array.range(0, n).map(Integer.valueOf)
      java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
        java.lang.Long.compare(hs(a), hs(b)))
      val h0 = hs(idx(0))
      val h1 = hs(idx(n - 1))
      var nObs = 0L
      var locf = 0L
      var run = 0L
      var runDefined = false
      var anySum = false
      i = 0
      while (i < n) {
        val k = idx(i)
        if (!isNullCent(k)) { run = cents(k); runDefined = true; nObs += 1 }
        if (runDefined) {
          val next = if (i < n - 1) hs(idx(i + 1)) else h1 + 1
          locf += run * (next - hs(k))
          anySum = true
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        h1 - h0 + 1, nObs, if (anySum) locf else null)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** q31's two token counts in one linear pass — r18 (guide §1.2):
  * `size(split(text, ' '))` materializes the word array and
  * `size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))`
  * materializes EVERY regex match, both only to be counted. This kernel
  * counts without materializing:
  *  - ws_tokens = spaces + 1 (split keeps empty fields, so the count is
  *    exactly separator count + 1);
  *  - re_tokens walks code points replaying the pattern's leftmost-
  *    greedy semantics: a maximal [a-z] run counts 1, a maximal [0-9]
  *    run counts 1, a space matches nothing, anything else counts 1 per
  *    CODE POINT (negated classes match full code points in both Java
  *    regex and RE2 — astral chars count once, like the regex).
  * Spec-pinned in TextKernelsSpec against the original expressions on
  * corpus + adversarial unicode. NULL text → NULL struct.
  * CodegenFallback: one eval per row, primitive loop inside. */
case class TokenCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts expects string, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("re_tokens", LongType, nullable = false)))
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    var ws = 1L
    var re = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') { ws += 1; i += 1 }
      else if (c >= 'a' && c <= 'z') {
        re += 1
        i += 1
        while (i < len && { val x = s.charAt(i); x >= 'a' && x <= 'z' }) i += 1
      } else if (c >= '0' && c <= '9') {
        re += 1
        i += 1
        while (i < len && { val x = s.charAt(i); x >= '0' && x <= '9' }) i += 1
      } else {
        // one match per CODE POINT (surrogate pair = one match)
        re += 1
        i += (if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(ws, re)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RollingFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects string, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.rollingFp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
