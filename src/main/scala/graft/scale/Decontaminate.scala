package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene pass (the real-world n is ~13; tests use a smaller n sized
  * to the synthetic corpus).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus, so
  * its distinct grams broadcast; the corpus explodes once, inner-joins
  * the broadcast set (rows that can't be contaminated drop map-side)
  * and aggregates hit counts per doc. The only shuffle is the per-doc
  * count, carrying one row per (doc, matched gram).
  */
object Decontaminate {

  /** Per-document overlap report: `idCol, n_grams, overlap,
    * contaminated` (overlap = how many of the doc's distinct n-grams
    * appear anywhere in `bench`). Single corpus pass: shingles are
    * computed and exploded once (explode_outer keeps gram-less docs),
    * left-joined against the broadcast bench grams, and both counts
    * come out of one aggregation. */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // hashed grams: the join carries/broadcasts longs, not gram strings.
    // Tokenize in a separate projection so the HOF lambda reads an
    // attribute instead of re-running the regex split per gram.
    def grams(df: DataFrame) = df
      .select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode_outer(Dedup.hashedShinglesFromTokens(col("__toks"), n)).as("g"))
    val benchGrams = grams(bench).select("g").distinct()
      .withColumn("__hit", lit(1))
    // grams are distinct within a doc, so count = distinct-gram count
    grams(corpus)
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(col("g")).as("n_grams"), count(col("__hit")).as("overlap"))
      .withColumn("contaminated", (col("overlap") > 0).cast("int"))
  }

  /** Embedding-space decontamination — the semantic complement of the
    * n-gram [[overlap]] pass (paraphrased benchmark leakage has zero
    * gram overlap but high embedding cosine). Per corpus vector:
    * `idCol, max_sim` (best cosine against ANY benchmark vector, round
    * 6), `n_close` (benchmark vectors at ≥ `minCosine`), `contaminated`.
    *
    * Scale shape: the benchmark embedding set is tiny relative to the
    * corpus by construction, so it BROADCASTS into a nested-loop pass
    * over the corpus and both statistics fold map-side in the partial
    * aggregate — the corpus is scanned once and only one (id, max, cnt)
    * row per corpus vector ever shuffles. A benchmark too large to
    * broadcast needs the banded q117 shape instead; this operator's
    * contract is the broadcast-dim regime (the real-world case:
    * benchmarks are thousands of rows, corpora are billions). */
  def embeddingOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, minCosine: Double): DataFrame = {
    val b = bench.select(col(vecCol).cast("array<double>").as("__bv"))
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .crossJoin(broadcast(b))
      .withColumn("__sim",
        round(Similarity.cosine(col("__cv"), col("__bv")), 6))
      .groupBy(idCol)
      .agg(max(col("__sim")).as("max_sim"),
        sum(when(col("__sim") >= minCosine, 1L).otherwise(0L))
          .as("n_close"))
      .withColumn("contaminated", (col("n_close") > 0).cast("int"))
  }
}
