package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition pass (combining sequences → precomposed
  * codepoints) every multilingual corpus pipeline runs before hashing or
  * deduplicating text: the SAME visible string must hash identically
  * regardless of how a scraper encoded it.
  *
  * Why an Expression (SURVEY §7.3 preference order): Spark has no
  * built-in normalizer, a UDF pays the serialization boundary per row,
  * and this stays inside whole-stage codegen as a static call — the
  * same pattern as [[VecDot]]. The kernel is `java.text.Normalizer`
  * (ICU-equivalent for NFC), which implements the same Unicode standard
  * as DuckDB's utf8proc `nfc_normalize`, so the two engines agree
  * byte-for-byte and the q74 oracle can hash the result.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** static codegen target: NFC-normalize one UTF8String. Already-NFC
    * strings (the overwhelming common case) short-circuit without
    * re-encoding. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
