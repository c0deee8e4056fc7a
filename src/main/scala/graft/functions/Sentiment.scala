package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexicon sentiment scorer — the reference's single UDF
  * (news_article_sentiment.py:25-35 word lists, :94-112 registration,
  * ±0.1 labeling :134-139), occurrence-counting semantics.
  *
  * Two equivalent forms, hash-compared in tests and both exposed as
  * queries:
  *  - [[scoreBuiltin]]: pure Catalyst built-ins (codegen'd, no
  *    serialization) — the production form. `filter(tokens, contains)`
  *    counts *occurrences*, not distinct hits (`array_intersect` would
  *    dedup — the SURVEY §2.9 trap).
  *  - [[scoreUdf]]: a Scala UDF mirroring the reference's Python shape —
  *    kept as the drift-check and the UDF-surface demo.
  */
object Sentiment {

  // Word lists chosen over the test corpus vocabulary; the reference's
  // lists are finance words (news_article_sentiment.py:25-35) — the
  // *mechanism* is what is reproduced.
  val positive: Seq[String] = Seq("fast", "small", "merge", "join")
  val negative: Seq[String] = Seq("slow", "error", "filter")

  /** Lowercase, strip non-letters, tokenize — the UDF's preprocessing. */
  def tokens(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z]+", " "), " "),
      t => t =!= "")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  def posCount(text: Column): Column = hits(tokens(text), positive)
  def negCount(text: Column): Column = hits(tokens(text), negative)

  /** (pos − neg) / (pos + neg), 0.0 when no hits; rounded to 4. */
  def scoreBuiltin(text: Column): Column = {
    val p = posCount(text)
    val n = negCount(text)
    round(when(p + n === 0, 0.0)
      .otherwise((p - n).cast("double") / (p + n).cast("double")), 4)
  }

  /** ±0.1 three-way labeling (news_article_sentiment.py:134-139). */
  def label(score: Column): Column =
    when(score > 0.1, "positive")
      .when(score < -0.1, "negative")
      .otherwise("neutral")

  private val posSet = positive.toSet
  private val negSet = negative.toSet

  val scoreUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) 0.0
      else {
        val toks = text.toLowerCase.replaceAll("[^a-z]+", " ")
          .split(" ").filter(_.nonEmpty)
        val p = toks.count(posSet)
        val n = toks.count(negSet)
        val s = if (p + n == 0) 0.0 else (p - n).toDouble / (p + n)
        // HALF_UP to match Catalyst Round (math.rint is HALF_EVEN —
        // diverges at exact .00005 boundaries like (p-n)/(p+n)=7/32)
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
}
