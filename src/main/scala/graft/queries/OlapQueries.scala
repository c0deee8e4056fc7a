package graft.queries

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** General OLAP surface beyond the reference (SURVEY §2.4 "absent"
  * rows): multi-dimensional aggregation, pivot, percentiles,
  * decorrelated subqueries — built-ins a complete engine must expose. */
object OlapQueries {

  /** ROLLUP with grouping() flags (subtotals + grand total). */
  val qRollup: QueryDef = QueryDef(
    "q66_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
      |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("bigint")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("qty"))
  }

  /** Pivot: quantity totals per linestatus, one column per returnflag.
    * Explicit pivot values → stable schema at any scale (no distinct
    * scan to discover columns). */
  val qPivot: QueryDef = QueryDef(
    "q67_pivot",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS A,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS N,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS R
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast("bigint")))
  }

  /** Exact interpolated percentiles per group. Round at 3 — the
    * interpolation lattice is 0.005 (midpoints of 2-decimal money), so
    * 3 decimals recover it exactly in both engines. */
  val qPercentiles: QueryDef = QueryDef(
    "q68_percentiles",
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 3) AS median_price,
      |  round(quantile_cont(o_totalprice, 0.9), 3) AS p90_price,
      |  round(min(o_totalprice), 2) AS min_price
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 3).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 3).as("p90_price"),
        round(min(col("o_totalprice")), 2).as("min_price"))
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into a
    * join+agg (no per-row subquery execution). */
  val qCorrelated: QueryDef = QueryDef(
    "q69_correlated",
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
      |WHERE o_totalprice > round(2 * (SELECT avg(o_totalprice) FROM orders i
      |                          WHERE i.o_orderstatus = o.o_orderstatus), 2)""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
        |WHERE o_totalprice > round(2 * (SELECT avg(o_totalprice) FROM orders i
        |                          WHERE i.o_orderstatus = o.o_orderstatus), 2)""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(qRollup, qPivot, qPercentiles, qCorrelated)
}
