package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{lit => _}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit Hamming distance between two 16-hex-char signatures (the SimHash
  * comparison kernel): parse-unsigned, XOR, popcount.
  *
  * As a Column tree this is 64 nibble-extract/compare terms per pair
  * (`Dedup.simhashPairs`' original formulation — correct, but a huge
  * generated-code body in the candidate-join hot path). A native expression
  * with `doGenCode` compiles to three JVM intrinsics and stays inside
  * WholeStageCodegen. The SQL-visible twin of the DuckDB oracle's nibble
  * arithmetic — results are identical integers.
  */
object Hamming64 {
  /** Defined for 1..16-char hex strings; null on null input. */
  def hamming(a: String, b: String): Long =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))

  /** Column surface: resolves through the function registry (callers ensure
    * [[graft.GraftExtensions.register]] ran on the session — the operators
    * using it do so themselves). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("hamming64", a, b)
}

case class Hamming64Expression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hamming64.hamming(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"(long) java.lang.Long.bitCount(" +
        s"java.lang.Long.parseUnsignedLong($a.toString(), 16) ^ " +
        s"java.lang.Long.parseUnsignedLong($b.toString(), 16))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64Expression =
    copy(left = newLeft, right = newRight)
}
