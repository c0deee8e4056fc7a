package graft.queries

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Aggregation queries (SURVEY §2.4 A1/A8-A11). */
object AggQueries {

  /** A1 + A11: global high-watermark scalars — max id, and
    * COALESCE(max,0) over an empty slice. */
  val qScalarMax: QueryDef = QueryDef(
    "q12_scalar_max",
    """SELECT (SELECT max(o_orderkey) FROM orders) AS max_key,
      |       (SELECT COALESCE(max(o_orderkey), 0) FROM orders WHERE o_orderkey < 0) AS empty_max,
      |       (SELECT max(o_orderdate) FROM orders) AS max_ts""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
    val a = o.agg(max(col("o_orderkey")).as("max_key"),
      max(col("o_orderdate")).as("max_ts"))
    val b = o.filter(col("o_orderkey") < 0)
      .agg(coalesce(max(col("o_orderkey")), lit(0L)).as("empty_max"))
    a.crossJoin(b).select("max_key", "empty_max", "max_ts")
  }

  /** A8: per-key max (the per-symbol watermark lookup). */
  val qPerKeyMax: QueryDef = QueryDef(
    "q13_per_key_max",
    """SELECT o_orderstatus, max(o_orderdate) AS max_od,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  count(DISTINCT o_custkey) AS n_cust
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        max(col("o_orderdate")).as("max_od"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
  }

  /** A9: violation gather — count + *capped* ordered PK sample per
    * group (cap applied inside the pipeline, not post-hoc as the
    * reference does at 002_completeness:161-165; at 100 TB the filter
    * runs first so only violating keys reach the aggregation). */
  val qCollectCapped: QueryDef = QueryDef(
    "q14_collect_capped",
    """WITH v AS (SELECT l_returnflag, CAST(l_orderkey AS VARCHAR) AS pk
      |           FROM lineitem WHERE l_tax > 0.05),
      |r AS (SELECT l_returnflag, pk,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY pk) AS rn
      |      FROM v)
      |SELECT l_returnflag, count(*) AS n_viol,
      |  string_agg(CASE WHEN rn <= 999 THEN pk END,
      |             ',' ORDER BY pk) AS pk_sample
      |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_tax") > 0.05)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_viol"),
        // bounded CappedSortedSample, not collect_list+slice — the
        // latter buffers every key per group before trimming
        concat_ws(",",
          graft.functions.CappedSample.cappedSample(
            col("l_orderkey").cast("string"), 999))
          .as("pk_sample"))
  }

  /** U1: unionByName with missing columns (heterogeneous audit frames,
    * 005_send_alert_hourly.py:98-119). */
  val qUnionByName: QueryDef = QueryDef(
    "q15_union_by_name",
    """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderkey % 4 = 0
      |UNION ALL
      |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
      |FROM orders WHERE o_orderkey % 4 = 1""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
    val a = o.filter(col("o_orderkey") % 4 === 0)
      .select("o_orderkey", "o_totalprice")
    val b = o.filter(col("o_orderkey") % 4 === 1)
      .select("o_orderkey", "o_orderpriority")
    Seq(a, b).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Set ops: INTERSECT / EXCEPT over customer keys. */
  val qIntersect: QueryDef = QueryDef(
    "q16_intersect",
    """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin) { (s, dir) =>
    val a = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 150000).select(col("o_custkey"))
    val b = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("o_custkey"))
    a.intersect(b)
  }

  val qExcept: QueryDef = QueryDef(
    "q17_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders""".stripMargin) { (s, dir) =>
    val a = Tables.load(s, dir, "customer").select(col("c_custkey"))
    val b = Tables.load(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    a.except(b)
  }

  val all: Seq[QueryDef] = Seq(qScalarMax, qPerKeyMax, qCollectCapped,
    qUnionByName, qIntersect, qExcept)
}
