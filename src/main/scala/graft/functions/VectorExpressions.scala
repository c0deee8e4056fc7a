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

  /** Spark's Round(double, 0) semantics exactly: NaN/±Inf pass
    * through, otherwise scala BigDecimal(d).setScale(0, HALF_UP)
    * (verified against the RoundBase bytecode — the same special-case
    * then BigDecimal path). */
  def round0(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** One fused pass for [[graft.scale.Similarity.quantizeInt8]]:
    * q_i = round0(x_i · 127 / max|x|). Null elements stay null and are
    * skipped by the max, matching the composed
    * `transform(v, x -> round(x * 127.0 / array_max(transform(v,
    * abs)), 0))` element for element; an all-null or empty array gives
    * a null max, so every output element is null — also the composed
    * behavior. */
  def quantizeInt8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mx = java.lang.Double.NaN
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(a.getDouble(i))
        // array_max semantics: greatest non-null, NaN > any number
        if (!any || java.lang.Double.compare(v, mx) > 0) { mx = v; any = true }
      }
      i += 1
    }
    // ANSI parity: the composed form's x/0 throws DIVIDE_BY_ZERO under
    // ANSI mode (the session default) — a zero vector reaching the
    // quantizer is a caller-contract violation (callers filter mx > 0)
    // and must stay loud, not become a silent NaN vector
    if (any && mx == 0.0)
      throw new ArithmeticException(
        "quantize_int8: division by zero (all-zero vector — callers " +
        "must filter max|x| > 0 first, matching the composed form's " +
        "ANSI divide-by-zero)")
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i) && any)
        out(i) = round0(a.getDouble(i) * 127.0 / mx)
      else out(i) = null
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def quantizeInt8Col(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(v)))
}

case class QuantizeInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.quantizeInt8(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorMath.quantizeInt8($a);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8Expr = copy(child = newChild)
  override def prettyName: String = "quantize_int8"
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
