package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer KPI aggregation shapes.
  *
  * Re-expresses the reference's silver→gold aggregations
  * (spark/jobs/uber/silver_to_gold.py:49-72): grouped multi-agg with
  * conditional sums (A2/A3), ratio-of-sums (A4) and post-agg derived
  * rate columns (A5). All Catalyst built-ins → partial (map-side)
  * aggregation + final hash aggregation, fully codegen'd; at 100 TB the
  * only shuffle is on the (low-cardinality) group keys.
  */
object Kpi {

  /** sum(when(cond, 1) otherwise 0) — silver_to_gold.py:56-57. */
  def countIf(cond: Column): Column = sum(when(cond, 1).otherwise(0))

  /** Grouped KPI: per-group totals, conditional counts, a
    * ratio-of-sums and a derived percentage — the uber daily-KPI shape
    * on the TPC-H star schema. */
  def dailyKpis(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        graft.core.Money.moneySum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_rows"),
        countIf(col("l_quantity") > 25).as("big_qty_rows"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .withColumn(
        "big_qty_rate",
        round(col("big_qty_rows") * lit(100.0) / col("n_rows"), 2))
}
