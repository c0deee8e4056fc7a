package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling/splitting for training-data pipelines.
  *
  * [[deterministicSplit]] is the scale-correct way to cut train/val/
  * test: membership is a pure function of content (first byte of the
  * sha-256 fingerprint), so it is reproducible across runs, clusters
  * and engines, stable under repartitioning, and consistent for exact
  * duplicates — none of which holds for `rand()`-based splits.
  *
  * [[stratifiedSample]] wraps `DataFrame.stat.sampleBy` (per-stratum
  * Bernoulli sampling, seeded) for mixing-ratio adjustments; it is
  * engine-internal randomness → rows-only checks + contract specs.
  */
object Sampling {

  /** 0..255 bucket from the content fingerprint. */
  def hashBucket(text: Column): Column =
    conv(substring(Dedup.fingerprint(text), 1, 2), 16, 10).cast("int")

  /** Assign 'train'/'val'/'test' by content hash. Fractions are in
    * 256ths: e.g. (204, 26) ≈ 80/10/10. */
  def deterministicSplit(df: DataFrame, textCol: String,
      trainBuckets: Int = 204, valBuckets: Int = 26): DataFrame = {
    val b = hashBucket(col(textCol))
    df.withColumn("split",
      when(b < trainBuckets, "train")
        .when(b < trainBuckets + valBuckets, "val")
        .otherwise("test"))
  }

  /** Per-stratum sampling with target fractions (seeded). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic seeded shuffle + shard assignment — the global
    * training-data shuffle as a pure function of (id, seed): shard by
    * a 60-bit md5 hash, position within the shard by the same hash.
    * Reproducible across runs/engines and stable under repartitioning
    * (unlike `rand()` or `orderBy(rand())`); one hash-partitioned
    * window per shard, never a global sort. */
  def seededShards(df: DataFrame, idCol: String, shards: Int,
      seed: Long = 42L): DataFrame = {
    val h = Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(s":$seed")))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % shards).cast("int"))
      .withColumn("shard_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))))
      .drop("__h")
  }
}
