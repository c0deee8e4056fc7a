package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer cleaning operators.
  *
  * Re-expresses: latest-wins dedup W2 (coin_bronze2_to_silver.py:117-124,
  * finance_bronze2_to_silver.py:92-93), mean imputation A6
  * (uber/bronze2_to_silver.py:101-108), mode imputation A7 (:110-112),
  * multi-predicate validity filter P6
  * (alphavantage/bronze2_to_silver.py:85-96).
  *
  * Scale notes: dedup shuffles once on the key columns (window function
  * → single hash-partitioned exchange); imputation computes the scalar
  * with a 1-row aggregate (map-side partials, no driver materialization
  * beyond one row) then applies it map-side with `na.fill` — no second
  * shuffle.
  */
object Cleaning {

  /** W2: keep the newest row per key. `order` columns must make the
    * ordering total (include a unique tie-break) or the result is
    * nondeterministic. */
  def dedupLatestWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Agg-based deterministic dedup: keep the row whose `orderCols`
    * tuple is smallest per key, via `min(struct(orderCols ++ rest))` —
    * a hash aggregation instead of [[dedupLatestWins]]'s sort+window.
    * Faster when groups are small/near-unique (no per-partition sort,
    * map-side partial combine); same totality requirement on the
    * ordering. Column order in the output follows `orderCols ++ rest`.
    */
  def dedupFirstByKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(c => keys.contains(c) || orderCols.contains(c))
    val packed = struct((orderCols ++ rest).map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(min(packed).as("__pick"))
      .select(keys.map(col) ++ (orderCols ++ rest).map(c => col(s"__pick.$c")): _*)
  }

  /** A6: fill nulls in `colName` with round(avg, scale) of the non-null
    * values. One scalar aggregate job, then a map-side fill. */
  def imputeMean(df: DataFrame, colName: String, scale: Int = 2): DataFrame = {
    val row = df.agg(round(avg(col(colName)), scale)).first()
    // all-null column / empty frame → no mean exists; leave unfilled
    if (row.isNullAt(0)) df
    else df.na.fill(row.getDouble(0), Seq(colName))
  }

  /** A7: fill nulls in `colName` with the modal value; ties broken by
    * smallest value for determinism (the reference's `.first()` after
    * orderBy(count desc) is tie-unstable — documented divergence). */
  def imputeMode(df: DataFrame, colName: String): DataFrame = {
    val top = df.filter(col(colName).isNotNull)
      .groupBy(col(colName)).count()
      .orderBy(col("count").desc, col(colName).asc)
      .limit(1).collect()
    // all-null column / empty frame → no mode exists; leave unfilled
    top.headOption.fold(df)(r => df.na.fill(r.get(0).toString, Seq(colName)))
  }

  /** P6: conjunction of sanity predicates (the OHLC-filter shape). */
  def validityFilter(df: DataFrame, preds: Seq[Column]): DataFrame =
    df.filter(preds.reduce(_ && _))

  /** Time-of-day bucketing (uber/bronze2_to_silver.py:119-130). */
  def timeOfDayBucket(hourCol: Column): Column =
    when(hourCol >= 5 && hourCol < 12, "morning")
      .when(hourCol >= 12 && hourCol < 17, "afternoon")
      .when(hourCol >= 17 && hourCol < 21, "evening")
      .otherwise("night")
}
