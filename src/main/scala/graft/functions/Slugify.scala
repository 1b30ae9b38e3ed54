package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** City-name slugifier.
  *
  * Semantics mirror the reference (/root/reference/src/etl_weather/utils.py:348-353,
  * tested tests/test_utils.py:4-8): Unicode-normalize and strip combining
  * accents, replace every non-alphanumeric run with "-", trim leading/trailing
  * "-", lowercase; empty result falls back to "city"
  * ("São Paulo" -> "sao-paulo", "" -> "city").
  */
object Slugify {
  private val NonAlnum = "[^A-Za-z0-9]+".r
  private val Combining = "\\p{M}+".r

  def slugify(s: String): String = {
    if (s == null) return "city"
    val folded = Combining.replaceAllIn(Normalizer.normalize(s, Normalizer.Form.NFKD), "")
    val dashed = NonAlnum.replaceAllIn(folded, "-").stripPrefix("-").stripSuffix("-").toLowerCase
    if (dashed.isEmpty) "city" else dashed
  }
}

/** Native Catalyst expression for slugify, with whole-stage codegen.
  *
  * Registered as SQL function `slugify` by [[graft.GraftExtensions]]; unlike a
  * Scala UDF it stays inside WholeStageCodegen (no row-at-a-time encoder
  * boundary), so it is safe in per-row hot paths at scale.
  */
case class SlugifyExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "slugify"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Slugify.slugify(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Slugify.slugify($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SlugifyExpression =
    copy(child = newChild)
}
