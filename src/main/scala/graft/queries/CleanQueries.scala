package graft.queries

import graft.QueryDef
import graft.clean.Cleaning
import graft.core.{Cols, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Silver-layer cleaning queries (SURVEY §2.2 P4/P6, §2.4 A6/A7).
  * Dirty inputs are synthesized deterministically from key columns so
  * the DuckDB oracle can reproduce them exactly. */
object CleanQueries {

  /** P4: dirty-null normalization + cast. */
  val qDirtyCast: QueryDef = QueryDef(
    "q3_dirty_cast",
    """WITH raw AS (
      |  SELECT l_returnflag,
      |    CASE WHEN l_orderkey % 13 = 0 THEN 'null'
      |         WHEN l_orderkey % 17 = 0 THEN ' '
      |         WHEN l_orderkey % 19 = 0 THEN 'NaN'
      |         ELSE CAST(l_quantity AS VARCHAR) END AS rawv
      |  FROM lineitem),
      |norm AS (
      |  SELECT l_returnflag,
      |    CASE WHEN lower(trim(rawv)) IN ('null','none','nan','') THEN NULL
      |         ELSE CAST(rawv AS DOUBLE) END AS q
      |  FROM raw)
      |SELECT l_returnflag, count(*) AS n_rows,
      |  count(*) - count(q) AS n_null, sum(q) AS sum_q
      |FROM norm GROUP BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
      .withColumn("rawv",
        when(col("l_orderkey") % 13 === 0, lit("null"))
          .when(col("l_orderkey") % 17 === 0, lit(" "))
          .when(col("l_orderkey") % 19 === 0, lit("NaN"))
          .otherwise(col("l_quantity").cast("string")))
      .withColumn("q", Cols.nullNormalizedCast(col("rawv"), DoubleType))
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("q"))).as("n_null"),
        sum(col("q")).as("sum_q"))
  }

  /** A6 + A7: mean and mode imputation over synthesized nulls. */
  val qImpute: QueryDef = QueryDef(
    "q4_impute",
    """WITH base AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS v,
      |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS p
      |  FROM orders),
      |m AS (SELECT round(avg(v), 2) AS mv FROM base),
      |md AS (SELECT p AS mp FROM base WHERE p IS NOT NULL
      |       GROUP BY p ORDER BY count(*) DESC, p ASC LIMIT 1)
      |SELECT o_orderkey,
      |  COALESCE(v, (SELECT mv FROM m)) AS v_filled,
      |  COALESCE(p, (SELECT mp FROM md)) AS p_filled
      |FROM base""".stripMargin) { (s, dir) =>
    val base = Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("v"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("p"))
    val filled = Cleaning.imputeMode(Cleaning.imputeMean(base, "v"), "p")
    filled.select(col("o_orderkey"), col("v").as("v_filled"),
      col("p").as("p_filled"))
  }

  /** P6: multi-predicate validity filter (the OHLC-sanity shape) over
    * events. */
  val qValidity: QueryDef = QueryDef(
    "q5_validity_filter",
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE value IS NOT NULL AND value > 0
      |  AND event_type IN ('click','view','purchase','signup')
      |  AND ts IS NOT NULL AND user_id >= 0""".stripMargin) { (s, dir) =>
    Cleaning.validityFilter(
      Tables.load(s, dir, "events"),
      Seq(
        col("value").isNotNull, col("value") > 0,
        col("event_type").isin("click", "view", "purchase", "signup"),
        col("ts").isNotNull, col("user_id") >= 0))
      .select("event_id", "user_id", "event_type", "value")
  }

  /** P9/P10 + when-chain: hour extraction, time-of-day bucketing and a
    * max-anchored day-window filter (deterministic stand-in for the
    * reference's current_date windows). */
  val qTimeBucket: QueryDef = QueryDef(
    "q6_time_bucket",
    """WITH mx AS (SELECT max(ts) AS mts FROM events)
      |SELECT event_type,
      |  CASE WHEN date_part('hour', ts) >= 5 AND date_part('hour', ts) < 12 THEN 'morning'
      |       WHEN date_part('hour', ts) >= 12 AND date_part('hour', ts) < 17 THEN 'afternoon'
      |       WHEN date_part('hour', ts) >= 17 AND date_part('hour', ts) < 21 THEN 'evening'
      |       ELSE 'night' END AS bucket,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |WHERE ts >= (SELECT mts FROM mx) - INTERVAL 7 DAY
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val mx = ev.agg(max(col("ts")).as("mts"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("mts") - expr("INTERVAL 7 DAY"))
      .withColumn("bucket", Cleaning.timeOfDayBucket(hour(col("ts"))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  val all: Seq[QueryDef] = Seq(qDirtyCast, qImpute, qValidity, qTimeBucket)
}
