package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization step a dedup/hash
  * pipeline runs BEFORE fingerprinting (CCNet normalizes before hashing):
  * "café" spelled with a precomposed U+00E9 and with "e" + combining
  * U+0301 are the same text but different bytes, so every content hash,
  * line key, and shingle fingerprint in the engine would treat them as
  * distinct documents. NFC (canonical composition) folds canonical
  * equivalents to one byte form while leaving compatibility variants
  * (ligatures, full-width forms) alone — the conservative choice for
  * dedup keys, where NFKC would merge texts a human considers different.
  *
  * Spark has no normalization function, so this is a native expression
  * (SQL `nfc_normalize`, matching DuckDB's function of the same name —
  * which is also how the oracle mirrors it). Null -> null; ASCII is a
  * no-op (java.text.Normalizer short-circuits via isNormalized).
  */
object TextNormalize {
  /** Column surface (native expression; registered by GraftExtensions). */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)

  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
}

/** Native Catalyst expression for [[TextNormalize.nfc]] with whole-stage
  * codegen (static kernel call, no encoder boundary). */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextNormalize.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNormalize.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}
