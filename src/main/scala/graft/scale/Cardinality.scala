package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally maintained DISTINCT counts via mergeable HLL sketches
  * (Apache DataSketches through Spark's built-in `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`).
  *
  * The production shape is the q139 additive-stats pattern applied to
  * the one gold-layer statistic that ISN'T additive: distinct users /
  * documents / keys. Exact daily distincts can be summed across days
  * only by re-scanning history (distinct is not a sum); an HLL sketch
  * is a few KB per group, each ingest batch appends its own sketch
  * rows (one narrow aggregate over the batch), and ANY rollup — per
  * day, per month, global, per dimension slice — is a sketch UNION
  * over the tiny persisted rows. At 100 TB the corpus is read once,
  * ever; cardinality questions are answered from kilobytes.
  *
  * Estimates are deterministic for a given input set (DataSketches
  * hashing is seed-fixed), and union is associative/commutative/
  * idempotent — batch boundaries and replay cannot change the answer
  * (the same algebra the StreamClusters fold leans on). Accuracy is a
  * CHECKED contract here: [[estimateChecked]] gates the relative error
  * against an exact count in-plan, the q142/q150 pattern.
  */
object Cardinality {

  /** Per-batch sketch delta: one row per group — (groupCols*,
    * sketch binary). Appended to a stats table; never recomputed. */
  def sketchDelta(batch: DataFrame, keyCol: String,
      groupCols: Seq[String], lgK: Int = 12): DataFrame =
    batch.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))

  /** Distinct-count estimates per group from the UNION of appended
    * sketch deltas — the groupCols here may be any SUBSET of the
    * delta's grouping (roll up days to months to global): distinct
    * merges correctly where exact counts cannot be summed. */
  def estimate(deltas: DataFrame, groupCols: Seq[String]): DataFrame = {
    val uni = hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
      .as("n_distinct_est")
    if (groupCols.isEmpty) deltas.agg(uni)
    else deltas.groupBy(groupCols.map(col): _*).agg(uni)
  }

  /** [[estimate]] with the accuracy contract attached: joins the
    * estimates against `exact` (a frame with the same groupCols plus
    * an exact `n_exact` column) and gates |est − exact| / exact ≤
    * `relErrBound` in-plan via assert_true — a sketch regression
    * (wrong lgK, bad merge, datasketches behavior change) fails the
    * query instead of silently drifting the metric. */
  def estimateChecked(deltas: DataFrame, exact: DataFrame,
      groupCols: Seq[String], relErrBound: Double): DataFrame = {
    val err = abs(col("n_distinct_est") - col("n_exact").cast("double")) /
      col("n_exact").cast("double")
    estimate(deltas, groupCols)
      .join(exact, groupCols)
      .filter(assert_true(err <= relErrBound,
        lit(s"HLL estimate drifted past rel-err $relErrBound — " +
          "check lgK / merge path")).isNull)
      .withColumn("within_bound", lit(true))
  }
}
