package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — the document
  * fingerprinting primitive (BASELINE.json text-analysis extension) as
  * a native Catalyst `Expression` with real codegen: the hot loop
  * compiles into the generated stage (one static call, no UDF
  * serialization, no InternalRow boxing), demonstrating the §7
  * custom-expression path.
  *
  * h = Σ byte_i · 31^(n-1-i)  (mod 2^64), i.e. Java-String-hashCode
  * widened to 64 bits over UTF-8 bytes.
  */
object RollingHash {
  val Base = 31L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    h
  }

  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)

  /** Column API: rolling hash of the raw string. (Spark 4 Columns wrap
    * ColumnNodes, not Expressions — ExpressionUtils bridges.) */
  def rollingHash(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))
  }

  /** Fingerprint over the whitespace-normalized lowercase form (same
    * equivalence class as [[graft.scale.Dedup.fingerprint]], 8 bytes
    * instead of 32 — the cheap first-pass key at 100 TB). */
  def fingerprint64(text: Column): Column =
    rollingHash(trim(regexp_replace(lower(text), "\\s+", " ")))
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}
