package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance from the change feed — the batch
  * consumer pattern Delta CDF exists for: a count/sum gold table is
  * kept current by applying version-range deltas, never re-scanning
  * the base table (at 100 TB, the difference between O(changes) and
  * O(table) per refresh).
  *
  * Decomposability: inserts and update post-images add with weight +1,
  * deletes and update pre-images subtract with weight −1 — count and
  * sum are linear in row weight, so the refreshed gold equals the
  * full re-aggregation of the target version (q125's oracle proves it
  * end-to-end). Groups whose count reaches zero are dropped (they no
  * longer exist in the base). Non-linear aggregates (min/max/distinct)
  * need re-aggregation of affected groups instead — out of scope here.
  */
object IncrementalView {

  /** Full aggregation of `rows`: one output row per `groupExpr` value
    * with `n` (count) and `<c>_sum` per value column — the bootstrap
    * shape [[applyChanges]] maintains. */
  def aggregate(rows: DataFrame, groupExpr: Column, groupName: String,
      valueCols: Seq[String]): DataFrame =
    rows.groupBy(groupExpr.as(groupName))
      .agg(count(lit(1)).as("n"),
        valueCols.map(c => sum(col(c)).as(s"${c}_sum")): _*)

  /** Apply a CDF batch ([[VersionedTableIO.readChanges]] output) to a
    * gold frame produced by [[aggregate]]. One pass over the changes,
    * one key-join against the (group-sized) gold — the base table is
    * never touched. */
  def applyChanges(gold: DataFrame, changes: DataFrame,
      groupExpr: Column, groupName: String,
      valueCols: Seq[String]): DataFrame = {
    val w = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes.withColumn("__w", w)
      .groupBy(groupExpr.as(groupName))
      .agg(sum(col("__w")).as("n"),
        valueCols.map(c =>
          sum(col(c) * col("__w")).as(s"${c}_sum")): _*)
    gold.unionByName(delta)
      .groupBy(groupName)
      .agg(sum(col("n")).as("n"),
        valueCols.map(c => sum(col(s"${c}_sum")).as(s"${c}_sum")): _*)
      .filter(col("n") > 0)
  }

  /** Bootstrap-or-refresh convenience: gold for `toVersion` of a
    * versioned table, computed from a prior gold at `fromVersion` plus
    * the change feed between them. */
  def refresh(spark: SparkSession, io: VersionedTableIO, table: String,
      keys: Seq[String], fromVersion: Long, toVersion: Long,
      goldAtFrom: DataFrame, groupExpr: Column, groupName: String,
      valueCols: Seq[String]): DataFrame =
    applyChanges(goldAtFrom,
      io.readChanges(spark, table, fromVersion, toVersion, keys),
      groupExpr, groupName, valueCols)
}
