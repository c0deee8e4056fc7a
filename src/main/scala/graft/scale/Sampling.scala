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

  /** Deterministic stratified sampling — the mixing-ratio form of
    * [[weightedSample]]: each row survives iff its content-hash
    * fraction (salted, uniform in [0,1)) is below its STRATUM's
    * target fraction. Fractions are catalog-sized (languages,
    * sources) so the rate map broadcasts; membership is a pure
    * function of content, hence reproducible across runs, clusters
    * and engines — the cross-engine-replayable alternative to the
    * seeded [[stratifiedSample]] when the keep/drop decisions
    * themselves must be auditable. Adds `keep_frac`. */
  def stratifiedDeterministic(df: DataFrame, stratumCol: String,
      textCol: String, fractions: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val f = broadcast(fractions.toSeq.toDF(stratumCol, "__rate"))
    // salt "ss:" keeps the draw independent of weightedSample's "ws:"
    // stream and deterministicSplit's bucket byte
    val frac = Dedup.md5Hash60(concat(lit("ss:"), col(textCol))) /
      lit(1152921504606846976.0) // 2^60
    df.withColumn("keep_frac", frac)
      .join(f, Seq(stratumCol))
      .filter(col("keep_frac") < col("__rate"))
      .drop("__rate")
  }

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

  /** Exact per-stratum quota sampling: the first `quota` rows of each
    * stratum in deterministic content-hash order. Output adds `rank`
    * (1-based position within the stratum's hash order).
    *
    * Scale note: the per-stratum window puts one whole stratum in one
    * partition — exact quotas are inherently a per-stratum total
    * order. Fine while strata are catalog-sized (languages, sources);
    * for web-scale strata use the rate-based approximate form
    * ([[temperatureMix]]/[[weightedSample]]), which needs no sort. */
  def quotaSample(df: DataFrame, stratumCol: String, textCol: String,
      idCol: String, quotas: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = broadcast(quotas.toSeq.toDF(stratumCol, "__quota"))
    val h = Dedup.md5Hash60(concat(lit("qs:"), col(textCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w))
      .join(q, Seq(stratumCol))
      .filter(col("rank") <= col("__quota"))
      .drop("__quota")
  }

  /** Exact proportional stratified sampling via the largest-remainder
    * (Hare quota) method: allocate a GLOBAL budget of `budgetDocs`
    * docs across strata exactly proportionally — stratum g with n_g
    * of N docs gets floor(B·n_g / N) plus at most one remainder
    * unit, the extra units going to the largest integer remainders
    * (B·n_g mod N, ties by stratum value ascending) — so
    * Σ alloc_g == min(B, N) EXACTLY, where [[temperatureMix]]'s
    * per-row draws hit the budget only in expectation. Every
    * allocation quantity is 64-bit INTEGER arithmetic (`DIV` / `%` —
    * no FP anywhere), so both engines agree bit-for-bit; exact while
    * B·n_g fits a long. Selection within a stratum is the
    * [[quotaSample]] machinery: the first alloc_g docs in
    * deterministic (content-hash, id) order.
    *
    * Scale shape: one narrow (stratum) count aggregate; the
    * allocation windows run over the CATALOG-SIZED strata frame
    * (≤2 SinglePartition exchanges moving ≤|strata| rows — the q171
    * tiny-frame contract); per-stratum selection is ONE corpus
    * window partitioned by stratum ordered on (60-bit hash, id) —
    * text never shuffles as a key. Output: stratumCol, idCol, rank,
    * alloc. */
  /** The largest-remainder core shared by [[proportionalSample]] and
    * [[scoreWeightedAllocation]]: given a (stratum, `__n` weight)
    * frame, allocate min(budget, Σ __n) units proportionally to the
    * weights — floor(B·w_g / Σw) plus one remainder unit for the
    * largest (B·w_g mod Σw), ties by stratum ascending. All 64-bit
    * integer arithmetic; exact while B·w_g fits a long. The windows
    * run over the catalog-sized strata frame only. */
  private def largestRemainder(weights: DataFrame, stratumCol: String,
      budget: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // "__tot", not "__N": withColumn replaces case-INsensitively, so a
    // column named __N would silently overwrite __n
    // greatest(tot, 1): an all-zero weight frame (a corpus whose every
    // doc scores 0) must allocate zeros, not raise ANSI
    // division-by-zero — B is already 0 via least(budget, tot)
    weights
      .withColumn("__tot",
        greatest(sum(col("__n")).over(W.partitionBy()), lit(1L)))
      .withColumn("__B",
        least(lit(budget), sum(col("__n")).over(W.partitionBy())))
      .withColumn("__base", expr("(__B * __n) DIV __tot"))
      .withColumn("__rem", (col("__B") * col("__n")) % col("__tot"))
      .withColumn("__extra",
        col("__B") - sum(col("__base")).over(W.partitionBy()))
      .withColumn("__rr", row_number().over(W.partitionBy()
        .orderBy(col("__rem").desc, col(stratumCol).asc)))
      .select(col(stratumCol), col("__n"),
        (col("__base") +
          when(col("__rr") <= col("__extra"), 1L).otherwise(0L))
          .as("alloc"))
  }

  def proportionalSample(df: DataFrame, stratumCol: String,
      textCol: String, idCol: String, budgetDocs: Long): DataFrame = {
    require(budgetDocs >= 0, "budget must be non-negative")
    val W = org.apache.spark.sql.expressions.Window
    val alloc = largestRemainder(
      df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n")),
      stratumCol, budgetDocs).drop("__n")
    val h = Dedup.md5Hash60(concat(lit("ps:"), col(textCol)))
    val w = W.partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq(stratumCol))
      .filter(col("rank") <= col("alloc"))
      .select(col(stratumCol), col(idCol), col("rank"), col("alloc"))
  }

  /** Score-weighted domain allocation (DoReMi's artifact shape —
    * Xie et al. 2023 — without the proxy-model loop): split a global
    * TOKEN budget across domains proportionally to each domain's
    * total quality-score MASS, not its document count — domains whose
    * documents score higher per doc get a super-proportional share,
    * which is the "upweight the domains the model benefits from"
    * reweighting as a one-pass data op. Weights must be exact
    * integers (micro-unit scores — the q171 trick); the allocation is
    * the same largest-remainder integer arithmetic as
    * [[proportionalSample]], so Σ alloc == min(budget, Σ weight)
    * EXACTLY and both engines agree bit-for-bit. The output frame
    * (stratum, weight sum, alloc) is catalog-sized and feeds
    * [[epochMixFrom]] or [[quotaSample]] as the factor/quota table.
    *
    * Scale shape: one narrow (stratum) aggregate over (stratum,
    * micro-long) rows; everything after runs on the ≤|strata|-row
    * frame.
    *
    * A stratum whose aggregated mass comes out NEGATIVE (callers may
    * pass signed scores) is clamped to 0 before allocation: the
    * largest-remainder invariants (truncating DIV == floor,
    * Σ alloc == B) only hold for non-negative weights, so a negative
    * mass allocates nothing rather than silently corrupting every
    * other stratum's share. `score_mass` reports the clamped value. */
  def scoreWeightedAllocation(df: DataFrame, stratumCol: String,
      scoreMicro: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    largestRemainder(
      df.groupBy(col(stratumCol))
        .agg(greatest(sum(scoreMicro), lit(0L)).as("__n")),
      stratumCol, budget)
      .select(col(stratumCol), col("__n").as("score_mass"), col("alloc"))
  }

  /** Temperature-scaled corpus mixing (the multilingual-sampling
    * standard): stratum d with n_d docs gets mass w_d = n_d^tau / Σ,
    * flattening the natural distribution toward uniform as tau → 0.
    * Each row then survives a deterministic content-hash draw at
    * rate min(1, budget·w_d / n_d) — approximate quotas, no
    * per-stratum sort, so it scales to arbitrary strata. Output adds
    * `keep_frac` (the stratum's rate, round-6). */
  def temperatureMix(df: DataFrame, stratumCol: String, textCol: String,
      tau: Double, budgetDocs: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), lit(tau)))
      .withColumn("__rate", least(lit(1.0),
        lit(budgetDocs.toDouble) * col("__w") /
          sum(col("__w")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()) / col("__n").cast("double")))
      .select(col(stratumCol), col("__rate"))
    val frac = Dedup.md5Hash60(concat(lit("tm:"), col(textCol))) /
      lit(1152921504606846976.0) // 2^60
    df.join(broadcast(counts), Seq(stratumCol))
      .filter(frac < col("__rate"))
      .withColumn("keep_frac", round(col("__rate"), 6))
      .drop("__rate")
  }

  /** Epoch mixing — materialize a training mixture with per-stratum
    * replication factors ("this source is seen 2.5 epochs"): every
    * row of a stratum with factor f emits floor(f) copies, plus one
    * more iff its content-hash fraction falls below frac(f), so the
    * stratum's realized size is f× its corpus count in expectation
    * with per-doc decisions deterministic. The UPsampling complement
    * of [[temperatureMix]], whose rates cap at 1: factors above 1
    * replicate (what LLaMA/DoReMi-style mixtures do to scarce
    * high-quality sources); factors in (0,1) degrade to weighted
    * downsampling on the same hash stream; factor 0 drops the
    * stratum. Each copy carries `copy_id` (0-based) and `mix_hash`, a
    * per-copy deterministic 60-bit hash distinct across copies — the
    * sort key a downstream seeded shuffle uses so replicas of one doc
    * scatter across shards/positions instead of training back-to-back.
    *
    * Scale shape: the factor table is catalog-sized and broadcasts;
    * the explode emits at most ceil(f) rows per input row; the whole
    * operator is a pure projection — ZERO exchanges, replication at
    * scan speed (the consumer's shuffle is where copies scatter). */
  def epochMix(df: DataFrame, stratumCol: String, textCol: String,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty, "need at least one stratum factor")
    require(epochs.values.forall(f => f >= 0.0 && f <= 64.0),
      "epoch factors must be in [0, 64] — higher is never a data mix")
    val spark = df.sparkSession
    import spark.implicits._
    epochMixFrom(df, stratumCol, textCol,
      epochs.toSeq.toDF(stratumCol, "epochs"))
  }

  /** [[epochMix]] with the factor table as a FRAME `(stratumCol,
    * epochs)` instead of a driver-side map — the composable form: a
    * pipeline that derives its mixture from corpus statistics (e.g.
    * uncapped temperature rates) feeds them in without any collect.
    * The factor frame must be catalog-sized (strata), it broadcasts. */
  def epochMixFrom(df: DataFrame, stratumCol: String, textCol: String,
      factors: DataFrame): DataFrame = {
    val e = broadcast(factors.select(col(stratumCol),
      col("epochs").cast("double").as("__f")))
    epochMixWeighted(df.join(e, Seq(stratumCol)), "__f", textCol)
      .drop("__f")
  }

  /** [[epochMixFrom]] with a PER-ROW replication factor column
    * instead of a per-stratum table — the duplicate-aware form: a
    * cluster of near-duplicate documents should be seen `epochs`
    * times AS A CLUSTER, so each member replicates at
    * epochs/cluster_size (the "count duplicates once" convention of
    * Dolma/FineWeb-style mixtures), a per-doc quantity no
    * catalog-sized stratum table can broadcast. Same copy semantics
    * as [[epochMixFrom]]: floor(f) copies plus one iff the doc's
    * content-hash fraction falls below frac(f), `copy_id` and the
    * per-copy `mix_hash` identical — the two forms agree bit-for-bit
    * when the factor column happens to be constant per stratum.
    *
    * Scale shape: a pure projection over whatever frame computed the
    * factor (zero exchanges of its own — the clustering that derived
    * cluster_size already paid its audited movement); the explode
    * emits ≤ ceil(f) rows per input row. */
  def epochMixWeighted(df: DataFrame, factorCol: String,
      textCol: String): DataFrame = {
    val f = col(factorCol).cast("double")
    val frac = Dedup.md5Hash60(concat(lit("em:"), col(textCol))) /
      lit(1152921504606846976.0) // 2^60
    df.withColumn("n_copies",
        (floor(f) + when(frac < f - floor(f), 1L).otherwise(0L))
          .cast("int"))
      .filter(col("n_copies") > 0)
      .withColumn("copy_id",
        explode(sequence(lit(0), col("n_copies") - 1)))
      .withColumn("mix_hash", Dedup.md5Hash60(concat(lit("emh:"),
        col("copy_id").cast("string"), lit(":"), col(textCol))))
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
