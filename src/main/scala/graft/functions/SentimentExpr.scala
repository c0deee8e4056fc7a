package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** The sentiment scorer as a native Catalyst expression — the SURVEY
  * §2.9 showcase. Third implementation of the same semantics
  * (occurrence-counting lexicon score): the built-in HOF form allocates
  * token arrays per row and falls back to interpreted lambdas; the UDF
  * form pays serialization; this one is a single fused byte-walk with
  * real codegen. All three are checked against the same oracle
  * (q26/q27/q75).
  */
object SentimentScore {

  private val pos = Sentiment.positive.toSet
  private val neg = Sentiment.negative.toSet

  /** Single pass: lowercase letters form tokens, anything else splits.
    * Matches `split(regexp_replace(lower(text), "[^a-z]+", " "), " ")`
    * occurrence counting exactly (ASCII corpus; non-ASCII letters are
    * treated as separators, same as the regex form). */
  def score(s: UTF8String): Double = {
    val str = s.toString
    var p = 0
    var n = 0
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = str.length
    while (i <= len) {
      val c = if (i < len) str.charAt(i) else ' '
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc >= 'a' && lc <= 'z') sb.append(lc)
      else if (sb.length > 0) {
        val tok = sb.toString
        if (pos(tok)) p += 1 else if (neg(tok)) n += 1
        sb.setLength(0)
      }
      i += 1
    }
    if (p + n == 0) 0.0
    else BigDecimal((p - n).toDouble / (p + n))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def scoreCol(c: Column): Column =
    ColumnBridge.column(SentimentScoreExpr(ColumnBridge.expression(c)))
}

case class SentimentScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SentimentScore.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SentimentScore.score($c)")

  override protected def withNewChildInternal(newChild: Expression): SentimentScoreExpr =
    copy(child = newChild)

  override def prettyName: String = "sentiment_score"
}
