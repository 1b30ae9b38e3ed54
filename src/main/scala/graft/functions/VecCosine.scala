package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
}

/** Children must already be `array<double>` — the [[VecCosine.cosine]]
  * wrapper casts (the same trust contract as [[Hamming64Expression]]'s hex
  * strings; `AbstractDataType` is not accessible outside Spark's packages,
  * so `ImplicitCastInputTypes` cannot be mixed in from here). */
case class VecCosineExpression(left: Expression, right: Expression)
    extends BinaryExpression {
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
