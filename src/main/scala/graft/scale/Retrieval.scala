package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — the BM25 side of the search story (the
  * ANN operators in [[Similarity]] are its dense counterpart).
  *
  * Scale shape: one tokenize pass; the gram explode is filtered to the
  * query-term set BEFORE any shuffle, so the (doc, term) aggregate
  * carries only matching postings (≪ corpus tokens); document-frequency
  * and the (N, avgdl) corpus stats are term-count / single-row frames
  * broadcast into the scoring projection; the final top-k per term is
  * a rank window over the scored postings (WindowGroupLimit prunes).
  * Nothing ever shuffles the text column.
  *
  * Determinism: every float is derived from exact longs (tf, df, N,
  * Σdl) with a fixed expression shape — avgdl is exact-sum-then-divide,
  * NOT a float avg (partial-sum order would differ between engines) —
  * so scores are bit-stable and oracle-checkable.
  */
object Retrieval {

  /** Top-k documents per query term by BM25 (Robertson/Lucene IDF:
    * ln((N - df + 0.5)/(df + 0.5) + 1)). Output:
    * (term, idCol, score rounded to 6, rank ≤ k). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__dl"))
    val stats = toks.agg(count(lit(1)).as("__N"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val tf = toks
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isInCollection(terms))
      .groupBy(col(idCol), col("__t"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__N") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
          + lit(1.0)))
      .withColumn("score", round(
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("__t"))
          .orderBy(col("score").desc, col(idCol).asc)))
      .filter(col("rank") <= k)
      .select(col("__t").as("term"), col(idCol), col("score"), col("rank"))
  }
}
