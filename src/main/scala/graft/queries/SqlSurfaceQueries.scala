package graft.queries

import graft.QueryDef
import graft.core.{Money, Tables}
import org.apache.spark.sql.functions._

/** Round-3 SQL-surface extensions: unpivot/melt, correlated LATERAL,
  * ordered listagg, recursive CTEs, XML functions — the remaining
  * relational surface a user switching engines would expect. */
object SqlSurfaceQueries {

  /** UNPIVOT (wide → long melt) over an aggregated frame. Explicit
    * value-column list → stable schema; the melt itself is a zero-shuffle
    * Expand (each input row emits one row per metric map-side). */
  val qUnpivot: QueryDef = QueryDef(
    "q105_unpivot",
    """WITH w AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, metric, val
      |FROM w UNPIVOT (val FOR metric IN (qty, n, parts))""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("bigint")).as("qty"),
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("parts"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("n"), col("parts")), "metric", "val")
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    * top-k-per-group shape LATERAL uniquely expresses in SQL (Catalyst
    * decorrelates it to a ranked window, so it stays one shuffle, not a
    * per-row loop). Tiebreak on c_custkey: acctbal ties exist at scale. */
  val qLateral: QueryDef = QueryDef(
    "q106_lateral",
    """SELECT r.r_name, s.c_custkey, round(s.c_acctbal, 2) AS acctbal
      |FROM region r, LATERAL (
      |  SELECT c.c_custkey, c.c_acctbal
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3) s""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT r.r_name, s.c_custkey, round(s.c_acctbal, 2) AS acctbal
        |FROM region r, LATERAL (
        |  SELECT c.c_custkey, c.c_acctbal
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 3) s""".stripMargin)
  }

  /** Ordered LISTAGG (WITHIN GROUP) — deterministic string aggregation.
    * Grouped over a dimension table: per-group lists must stay
    * human-sized by design; at fact scale the capped-sample Aggregator
    * is the right tool, not listagg. */
  val qListagg: QueryDef = QueryDef(
    "q107_listagg",
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM nation GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "nation")
      .groupBy("n_regionkey")
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("nations"),
        count(lit(1)).as("n"))
  }

  /** Recursive CTE (Spark 4): month-spine fill — generate every month
    * between min and max order date, left-join monthly KPIs, zero-fill
    * gaps. The recursion depth is the month span (tiny, driver-safe);
    * the data-sized work stays one aggregated join. The max bound rides
    * along as a column so the recursive member needs no subquery. */
  val qRecursiveCte: QueryDef = QueryDef(
    "q108_recursive_spine",
    s"""WITH RECURSIVE months(m, mx) AS (
      |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
      |         CAST(date_trunc('month', max(o_orderdate)) AS DATE)
      |  FROM orders
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM months WHERE m < mx),
      |k AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(count(*) AS BIGINT) AS n,
      |    ${Money.moneySumSql("o_totalprice")} AS rev
      |  FROM orders GROUP BY 1)
      |SELECT months.m AS month, coalesce(k.n, 0) AS n_orders,
      |  coalesce(k.rev, 0.0) AS revenue
      |FROM months LEFT JOIN k ON months.m = k.m""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH RECURSIVE months(m, mx) AS (
        |  SELECT CAST(trunc(min(o_orderdate), 'MM') AS DATE),
        |         CAST(trunc(max(o_orderdate), 'MM') AS DATE)
        |  FROM orders
        |  UNION ALL
        |  SELECT add_months(m, 1), mx FROM months WHERE m < mx),
        |k AS (
        |  SELECT CAST(trunc(o_orderdate, 'MM') AS DATE) AS m,
        |    count(*) AS n, ${Money.moneySumSql("o_totalprice")} AS rev
        |  FROM orders GROUP BY 1)
        |SELECT months.m AS month, coalesce(k.n, 0L) AS n_orders,
        |  coalesce(k.rev, 0.0d) AS revenue
        |FROM months LEFT JOIN k ON months.m = k.m""".stripMargin)
  }

  /** XML functions (merged into Spark 4 core): struct → to_xml →
    * from_xml round-trip; the oracle computes the same projection
    * directly, so any serialization loss breaks the hash. */
  val qXmlRoundtrip: QueryDef = QueryDef(
    "q109_xml_roundtrip",
    """SELECT o_orderkey AS k, o_orderstatus AS s,
      |  round(o_totalprice, 2) AS p
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(to_xml(struct(
        col("o_orderkey").as("k"), col("o_orderstatus").as("s"),
        col("o_totalprice").as("p"))).as("xml"))
      .select(from_xml(col("xml"),
        lit("k BIGINT, s STRING, p DOUBLE")).as("r"))
      .select(col("r.k").as("k"), col("r.s").as("s"),
        round(col("r.p"), 2).as("p"))
  }

  val all: Seq[QueryDef] = Seq(qUnpivot, qLateral, qListagg,
    qRecursiveCte, qXmlRoundtrip)
}
