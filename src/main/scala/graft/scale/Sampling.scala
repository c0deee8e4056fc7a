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

  /** Sequence packing: group documents into fixed-token-budget
    * training sequences. Contiguous packing in shard order — running
    * token total within each shard, bin = total-so-far ÷ budget — the
    * deterministic, window-expressible form (greedy first-fit packs
    * marginally tighter but is inherently sequential). Scale shape:
    * one hash-partitioned window per shard, no global sort; shards
    * come from [[seededShards]] so the pre-pack shuffle is already the
    * seeded global shuffle training wants. Documents longer than
    * `budget` get a bin of their own (and overflow it — callers chunk
    * oversized docs first). Adds `pack_id` (unique across shards),
    * `pack_pos`, and the doc's running `pack_fill`. */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
      budget: Long, shards: Int, seed: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shard_pos"))
    val sharded = seededShards(df, idCol, shards, seed)
    // bin boundary: a doc starts a new bin when the PRIOR running total
    // already fills the budget — (cumsum - len) div budget groups docs
    // whose preceding fill is in the same budget window
    sharded
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("__bin",
        floor((col("__cum") - col(tokenCountCol)) / budget).cast("bigint"))
      // shard in the high bits (2^40 bins per shard headroom — at 100 TB
      // a shard holds ~tokens/budget bins, far below 10^12): collision-
      // free pack ids without a global sequence
      .withColumn("pack_id",
        col("shard").cast("bigint") * 1099511627776L + col("__bin"))
      .withColumn("pack_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("pack_id")).orderBy(col("shard_pos"))))
      .withColumn("pack_fill",
        col("__cum") - col("__bin") * budget)
      .drop("__cum", "__bin")
  }

  /** Quality-weighted deterministic sampling — importance resampling
    * for corpus mixing: each row survives iff its content-hash
    * fraction (uniform in [0,1), reproducible across engines) is below
    * `rate`, a caller-supplied per-row column (e.g. a quality-score
    * ramp). Same keep/drop decisions on every run, cluster, and
    * engine; no `rand()`. */
  def weightedSample(df: DataFrame, textCol: String,
      rate: Column): DataFrame = {
    // 60-bit md5 fraction of the CONTENT (salted so it's independent of
    // deterministicSplit's bucket byte). Kept unrounded: the division
    // is the same IEEE op in any engine, so the keep/drop comparison is
    // bit-reproducible.
    val frac = Dedup.md5Hash60(concat(lit("ws:"), col(textCol))) /
      lit(1152921504606846976.0) // 2^60
    df.withColumn("keep_frac", frac)
      .filter(col("keep_frac") < rate)
  }

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
