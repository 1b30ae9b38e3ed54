package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity between two `array<double>` vectors as a native
  * Catalyst expression (the ANN comparison kernel).
  *
  * The Column-tree formulation ([[VectorFunctions.cosine]]) is three
  * higher-order folds (`zip_with` + two `aggregate`s) — higher-order
  * functions are CodegenFallback in Spark, so every pair comparison in the
  * candidate-join hot path drops out of whole-stage codegen and walks three
  * lambda interpreters over the vector. This expression fuses the three
  * accumulations into ONE compiled loop with `doGenCode` and stays inside
  * WholeStageCodegen.
  *
  * Arithmetic contract (pinned by spec): identical to the Column tree and
  * the DuckDB oracle's `list_dot_product` mirrors — each accumulator sums
  * left-to-right in IEEE double, result = dot / (sqrt(na) * sqrt(nb)), so
  * the doubles are bit-identical. Null semantics also match the zip_with
  * formulation: mismatched lengths or a null element yield NULL (zip_with
  * pads with null, which poisons the fold).
  */
object VecCosine {
  /** Column surface: resolves through the function registry (callers ensure
    * [[graft.GraftExtensions.register]] ran on the session — the operators
    * using it do so themselves). Casts float embeddings to double like
    * [[VectorFunctions.cosine]]. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "vec_cosine", a.cast("array<double>"), b.cast("array<double>"))

  /** Native dot product — the kernel inside [[VectorFunctions.hyperplaneBucket]]'s
    * sign projections (bits × folds per SCAN row otherwise). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "vec_dot", a.cast("array<double>"), b.cast("array<double>"))

  /** Native squared L2 distance — the kernel inside the IVF coarse
    * quantizer's cell assignment (nLists folds per corpus row otherwise). */
  def dist2(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "vec_dist2", a.cast("array<double>"), b.cast("array<double>"))
}

/** Analysis-time input validation shared by the native vector kernels: both
  * children must already be `array<double>` (the [[VecCosine]] wrappers
  * cast; `AbstractDataType`/`ImplicitCastInputTypes` are not accessible
  * outside Spark's packages, so the check is spelled out). Without it, the
  * SQL-registered surface (`expr("vec_cosine(...)")` on an `array<int>`)
  * would reach `ArrayData.getDouble` on a 4-byte-element layout and return
  * garbage instead of an analysis error. */
trait VecArrayDoubleInputs { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Shared loop template for the native vector kernels: one compiled pass,
  * accumulating `combine(x, y)` left-to-right in IEEE double — the same
  * order as the `aggregate`-over-`zip_with` Column trees these replace, so
  * results are bit-identical. NULL on length mismatch or a null element
  * (the zip_with padding contract). Children must be `array<double>`,
  * enforced at analysis time by [[VecArrayDoubleInputs]]. */
abstract class VecFoldExpression extends BinaryExpression with VecArrayDoubleInputs {
  override def dataType: DataType = DoubleType
  // null even on non-null inputs: length mismatch or a null element
  override def nullable: Boolean = true

  protected def combine(x: Double, y: Double): Double
  /** Java source for the codegen path; `x`/`y` are double variable names. */
  protected def combineJava(x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += combine(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $acc += ${combineJava(x, y)};
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

case class VecDotExpression(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_dot"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpression =
    copy(left = newLeft, right = newRight)
}

case class VecDist2Expression(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_dist2"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDist2Expression =
    copy(left = newLeft, right = newRight)
}

/** Children must be `array<double>`, enforced at analysis time by
  * [[VecArrayDoubleInputs]] — the [[VecCosine.cosine]] wrapper casts. */
case class VecCosineExpression(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayDoubleInputs {
  override def dataType: DataType = DoubleType
  // null even on non-null inputs: length mismatch or a null element
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpression =
    copy(left = newLeft, right = newRight)
}
