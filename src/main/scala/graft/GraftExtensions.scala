package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{Hamming64Expression, SlugifyExpression, VecCosineExpression, VecDist2Expression, VecDotExpression}

/** SparkSessionExtensions entry point: registers the engine's native Catalyst
  * expressions so they are callable from SQL and `expr(...)`.
  *
  * Install with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or by calling [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("slugify"),
      new ExpressionInfo(classOf[SlugifyExpression].getName, "slugify"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SlugifyExpression(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64Expression].getName, "hamming64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Hamming64Expression(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosineExpression].getName, "vec_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosineExpression(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpression].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotExpression(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[VecDist2Expression].getName, "vec_dist2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDist2Expression(children.head, children(1))
    ))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-created session (useful when
    * the session builder is owned by someone else, e.g. the test driver). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("slugify"),
      new ExpressionInfo(classOf[SlugifyExpression].getName, "slugify"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SlugifyExpression(children.head)
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64Expression].getName, "hamming64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Hamming64Expression(children.head, children(1))
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosineExpression].getName, "vec_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosineExpression(children.head, children(1))
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpression].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotExpression(children.head, children(1))
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[VecDist2Expression].getName, "vec_dist2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDist2Expression(children.head, children(1))
    )
  }
}
