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
}
