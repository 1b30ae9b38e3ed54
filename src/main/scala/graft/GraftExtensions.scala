package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharEntropyExpression, Hamming64Expression, NfcNormalizeExpression, SlugifyExpression, VecCosineExpression, VecDist2Expression, VecDotExpression}

/** SparkSessionExtensions entry point: registers the engine's native Catalyst
  * expressions so they are callable from SQL and `expr(...)`.
  *
  * Install with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or by calling [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Builder with an arity guard: a SQL call with the wrong argument count
    * fails with Spark's standard WRONG_NUM_ARGS AnalysisException (the same
    * error class the built-in FunctionRegistry raises, stable across Spark
    * versions) instead of an IndexOutOfBoundsException from `children(1)`. */
  private def build(name: String, n: Int, f: Seq[Expression] => Expression)
                   (children: Seq[Expression]): Expression = {
    if (children.size != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    f(children)
  }

  /** One registration table shared by the extensions hook and [[register]]
    * (the two paths can't drift). */
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Int, Seq[Expression] => Expression, Class[_])](
      ("slugify", 1, c => SlugifyExpression(c.head), classOf[SlugifyExpression]),
      ("char_entropy", 1, c => CharEntropyExpression(c.head), classOf[CharEntropyExpression]),
      ("nfc_normalize", 1, c => NfcNormalizeExpression(c.head), classOf[NfcNormalizeExpression]),
      ("hamming64", 2, c => Hamming64Expression(c.head, c(1)), classOf[Hamming64Expression]),
      ("vec_cosine", 2, c => VecCosineExpression(c.head, c(1)), classOf[VecCosineExpression]),
      ("vec_dot", 2, c => VecDotExpression(c.head, c(1)), classOf[VecDotExpression]),
      ("vec_dist2", 2, c => VecDist2Expression(c.head, c(1)), classOf[VecDist2Expression])
    ).map { case (name, n, f, cls) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
        build(name, n, f) _)
    }

  /** Register the same functions on an already-created session (useful when
    * the session builder is owned by someone else, e.g. the test driver). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
