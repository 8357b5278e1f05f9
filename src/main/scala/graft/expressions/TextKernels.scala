package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
