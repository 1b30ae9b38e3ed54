package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy of a string, in bits — the cheap gibberish /
  * boilerplate signal a web pipeline thresholds on (hex dumps and
  * base64 blobs sit near log2(alphabet); keyboard-mash and repeated-char
  * filler sits far below typical prose at ~4.0-4.5 bits for English).
  *
  * Definition: counts over Unicode CODE POINTS (L = code-point count) —
  * matching both Spark's own `length` semantics and regex-per-character
  * engines (a supplementary-plane char like an emoji is ONE symbol, not
  * two surrogate halves); entropy =
  * Σ_c round12(-(n_c/L)·ln(n_c/L)/ln 2), the per-character contributions
  * each rounded to 12 decimals and summed EXACTLY (decimal accumulation).
  * Rounding the contributions (the repo's cross-engine `ln` contract) and
  * summing them exactly makes the result ORDER-INDEPENDENT and
  * bit-reproducible on any engine: a DuckDB mirror is
  * `sum(CAST(round(-(n/L)*ln(n/L)/ln(2), 12) AS DECIMAL(28,12)))` over the
  * per-code-point group counts (`regexp_extract_all(text, '[\s\S]')`
  * extracts code points, so the mirror agrees on non-BMP text too).
  * Empty string -> 0.0; null -> null.
  */
object Entropy {
  /** Column surface (native expression; registered as SQL `char_entropy`
    * by [[graft.GraftExtensions]]). */
  def charEntropy(c: Column): Column =
    org.apache.spark.sql.functions.call_function("char_entropy", c)

  private val Ln2 = math.log(2.0)

  /** Kernel: one pass to count code points, one ordered-map-free exact
    * decimal fold over the distinct-char contributions. Alphabet size
    * bounds the fold (≤ distinct code points), so cost is O(len + alphabet)
    * per row. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Int]()
    var i = 0
    var nCp = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
      nCp += 1
    }
    var acc = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    val dl = nCp.toDouble
    while (it.hasNext) {
      val p = it.next().toDouble / dl
      val contrib = -(p * math.log(p) / Ln2)
      acc = acc.add(java.math.BigDecimal.valueOf(contrib)
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
    acc.doubleValue()
  }
}

/** Native Catalyst expression for [[Entropy.compute]], with whole-stage
  * codegen (the generated code calls the static kernel — one virtual call
  * per row, no encoder boundary). */
case class CharEntropyExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  // the SQL surface can hand us anything; fail analysis, not the executor
  // (NullType allowed: a NULL literal is still a null string)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    Entropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Entropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpression =
    copy(child = newChild)
}
