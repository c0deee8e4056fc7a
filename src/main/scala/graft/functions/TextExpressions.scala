package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused codegen expressions for the corpus text battery (round-14).
  *
  * The composed built-in forms (`size(regexp_extract_all(...))`,
  * `size(filter(toks, isInCollection(...)))`,
  * `aggregate(toks, 0, acc + length(t))`,
  * `array_distinct(filter(transform(sequence(...), i ->
  * concat_ws(" ", slice(...))), s -> s <> ''))`) all route through
  * higher-order functions, which are CodegenFallback: the quality
  * battery and the shingle projection run INTERPRETED, one boxed
  * lambda call per element, exactly in the corpus family's
  * single-partition hot stages (ExprBench: qualityScore 0.70 s,
  * shingles 0.51 s per 5k docs per core). Each expression here is one
  * fused pass with real codegen; each is pinned bit-equal to its
  * composed form in ScaleSpec (the [[VectorMath]]/[[Md5Hash60]]
  * pattern), and the composed forms remain on [[graft.scale.TextStats]]
  * / [[graft.scale.Dedup]] as `*Composed` cross-checks.
  */
object TextFns {

  /** Number of regex matches in `s` — the value of
    * `size(regexp_extract_all(s, pattern, 0))` (matcher.find loop). */
  def regexCount(s: UTF8String, p: Pattern): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Elements of `arr` (with duplicates) present in `set` — the value
    * of `size(filter(arr, x -> x IN set))`. Null elements never match
    * (isInCollection yields null → filter drops). */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Sum of `length(elem)` over the array — the value of
    * `aggregate(arr, 0, (acc, t) -> acc + length(t))`. A null element
    * nulls the whole fold there; -1 signals that here (mapped to null
    * by the expression). */
  def stringLenSum(arr: ArrayData): Int = {
    val n = arr.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return -1
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Distinct non-empty space-joined `n`-grams of the token array, in
    * first-occurrence order — the value of
    * `array_distinct(filter(transform(sequence(0, greatest(size-n, 0)),
    * i -> concat_ws(" ", slice(toks, i+1, n))), s -> s <> ''))`.
    * A slice that runs past the end truncates (the composed slice
    * semantics), so a doc shorter than `n` tokens yields its full
    * join as its one gram. Null tokens are skipped inside a gram
    * (concat_ws semantics). */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val size = arr.numElements()
    val last = math.max(size - n, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= last) {
      val hi = math.min(i + n, size)
      var j = i
      val sb = new java.lang.StringBuilder()
      var first = true
      while (j < hi) {
        if (!arr.isNullAt(j)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      if (sb.length() > 0) seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** The lowercase word-token stream — the value of
    * `filter(split(lower(text), "[^a-z]+"), t -> t <> '')`: splitting
    * on maximal non-[a-z] runs and dropping empties leaves exactly the
    * maximal [a-z]+ runs of the lowercased text, in order, duplicates
    * kept. Scanned at the byte level: after UTF8String.toLowerCase,
    * the bytes 0x61..0x7a occur only as the ASCII letters themselves
    * (UTF-8 continuation bytes are ≥ 0x80), so a byte scan finds the
    * same runs the regex split does. */
  def wordTokens(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase
    val b = lowered.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = b.length
    while (i < n) {
      if (b(i) >= 'a'.toByte && b(i) <= 'z'.toByte) {
        val start = i
        while (i < n && b(i) >= 'a'.toByte && b(i) <= 'z'.toByte) i += 1
        out.add(UTF8String.fromBytes(b, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def wordTokensCol(c: Column): Column =
    ColumnBridge.column(WordTokensExpr(ColumnBridge.expression(c)))

  def regexCountCol(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexCountExpr(ColumnBridge.expression(c), pattern))

  def countInSetCol(c: Column, set: Seq[String]): Column =
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(c), set))

  def stringLenSumCol(c: Column): Column =
    ColumnBridge.column(StringLenSumExpr(ColumnBridge.expression(c)))

  def wordShinglesCol(c: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), n))
}

case class WordTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    TextFns.wordTokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFns.wordTokens($s);")

  override protected def withNewChildInternal(
      newChild: Expression): WordTokensExpr = copy(child = newChild)
  override def prettyName: String = "word_tokens"
}

case class RegexCountExpr(child: Expression, pattern: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  @transient private lazy val compiled = Pattern.compile(pattern)

  override protected def nullSafeEval(s: Any): Any =
    TextFns.regexCount(s.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", compiled,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFns.regexCount($s, $p);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RegexCountExpr = copy(child = newChild)
  override def prettyName: String = "regex_count"
}

case class CountInSetExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    TextFns.countInSet(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextFns.countInSet($a, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSetExpr = copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

case class StringLenSumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val s = TextFns.stringLenSum(a.asInstanceOf[ArrayData])
    if (s < 0) null else s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      int graftLenSum = graft.functions.TextFns.stringLenSum($a);
      if (graftLenSum < 0) { ${ev.isNull} = true; }
      else { ${ev.value} = graftLenSum; }""")

  override protected def withNewChildInternal(
      newChild: Expression): StringLenSumExpr = copy(child = newChild)
  override def prettyName: String = "string_len_sum"
}

case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    TextFns.wordShingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextFns.wordShingles($a, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
  override def prettyName: String = "word_shingles"
}
