package graft.queries

import graft.QueryDef
import graft.core.{Money, Tables}
import graft.gold.Kpi
import org.apache.spark.sql.functions._

/** Gold-layer aggregation queries (SURVEY §2.4 A2-A5, §2.3 joins). */
object GoldQueries {

  val q1Kpi: QueryDef = QueryDef(
    "q1_kpi_agg",
    s"""SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  ${Money.moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_rows,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  round(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS big_qty_rate
      |FROM lineitem GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Kpi.dailyKpis(Tables.load(s, dir, "lineitem"))
  }

  /** Multi-way star join with broadcast dims: revenue per region and
    * market segment. Dims (region/nation/customer) are broadcast —
    * lineitem (the 100 TB fact) never shuffles for the dim joins; only
    * the lineitem⋈orders join and the final group-by shuffle. */
  val qStarJoin: QueryDef = QueryDef(
    "q2_star_join",
    s"""SELECT r.r_name AS region, c.c_mktsegment AS segment,
      |  count(*) AS n_items,
      |  ${Money.moneySumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("region"), c("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_items"),
        Money.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  /** Funnel conversion: users who purchased after their first view,
    * within the whole event horizon — one grouped pass over events
    * (min view ts, any purchase after it), then a global rollup. */
  val qFunnel: QueryDef = QueryDef(
    "q92_funnel",
    """WITH per_user AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      |  FROM events GROUP BY 1)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
      |  CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase > first_view
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  round(CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase > first_view
      |             THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
      |        / greatest(CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), 1), 2)
      |    AS conversion_pct
      |FROM per_user""".stripMargin) { (s, dir) =>
    val perUser = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("first_view").isNotNull, 1).otherwise(0)).as("n_viewed"),
      sum(when(col("first_view").isNotNull &&
        col("last_purchase") > col("first_view"), 1).otherwise(0))
        .as("n_converted"))
      .withColumn("conversion_pct",
        round(col("n_converted").cast("double") * 100.0 /
          greatest(col("n_viewed"), lit(1L)), 2))
  }

  val all: Seq[QueryDef] = Seq(q1Kpi, qStarJoin, qFunnel)
}
