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
    * appear anywhere in `bench`). */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val grams = corpus.select(col(idCol),
      explode(Dedup.shingleSet(col(textCol), n)).as("g"))
    val benchGrams = bench
      .select(explode(Dedup.shingleSet(col(textCol), n)).as("g")).distinct()
    // grams are distinct within a doc, so count(*) is the distinct-hit count
    val hits = grams.join(broadcast(benchGrams), "g")
      .groupBy(idCol).agg(count(lit(1)).as("overlap"))
    corpus.select(col(idCol),
        size(Dedup.shingleSet(col(textCol), n)).as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("contaminated", (col("overlap") > 0).cast("int"))
  }
}
