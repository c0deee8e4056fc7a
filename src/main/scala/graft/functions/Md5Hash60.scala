package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative long — the cross-engine
  * reproducible hash behind the deterministic MinHash mode and every
  * seeded sampling draw (`md5-60`: any engine with an md5 can replay
  * it, which is what makes the dedup/sampling oracles exact).
  *
  * Semantically identical to the composed form
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` — 15 hex
  * digits = the digest's first 60 bits — but computed straight from
  * the digest bytes. The composed form allocates a 32-char hex string,
  * substrings it, and string-parses the base-16 number PER CALL; in
  * the MinHash signature pass that is per shingle occurrence, the
  * single hottest expression in the corpus pipeline. This is one
  * digest + one shift, codegen'd (ScaleSpec asserts bit-equality with
  * the composed form).
  */
object Md5Hash60 {

  /** digest → big-endian first 8 bytes → drop the low nibble: the
    * value of the first 15 hex digits. */
  def hashUtf8(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def md5Hash60(c: Column): Column =
    ColumnBridge.column(Md5Hash60Expr(ColumnBridge.expression(c)))
}

case class Md5Hash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash60.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)

  override def prettyName: String = "md5_hash60"
}
