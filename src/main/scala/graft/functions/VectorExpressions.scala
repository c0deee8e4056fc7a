package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two array<double> columns.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), ...)`) builds
  * three intermediate arrays and runs interpreted lambdas per element —
  * Spark's higher-order functions are CodegenFallback, which breaks
  * whole-stage codegen exactly in the ANN hot loop. This expression is
  * one fused pass over the raw ArrayData with real codegen (a single
  * static call from the generated stage), allocation-free per row.
  * ScaleSpec asserts bit-equality with the composed form.
  */
object VectorMath {

  /** dot/(√‖a‖²·√‖b‖²) with the same per-component order as the
    * composed form, so results are bit-identical. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineCol(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarityExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  // dimension mismatch → NULL, matching the composed HOF form (zip_with
  // null-pads, which propagates to a null sum) — a truncated embedding
  // must not silently rank as a prefix-cosine neighbor
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else VectorMath.cosine(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorMath.cosine($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
