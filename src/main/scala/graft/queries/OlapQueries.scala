package graft.queries

import graft.QueryDef
import graft.core.{Money, Tables}
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

  /** CUBE — all 4 grouping combinations in one pass (partial aggs are
    * shared across grouping sets by Catalyst's Expand). */
  val qCube: QueryDef = QueryDef(
    "q76_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
      |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
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

  /** Explicit GROUPING SETS — only the requested combinations (here:
    * by flag, by status, grand total; no (flag,status) set). */
  val qGroupingSets: QueryDef = QueryDef(
    "q77_grouping_sets",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n,
      |  ${Money.moneySumSql("l_extendedprice")} AS total_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // the moneySum fragment is valid Spark SQL too — both engines run
    // the IDENTICAL text, so the flag can never skew one side only
    s.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  ${Money.moneySumSql("l_extendedprice")} AS total_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  /** FULL OUTER join — nation spine vs per-nation customer counts;
    * unmatched sides surface as NULLs on both wings. */
  val qFullOuter: QueryDef = QueryDef(
    "q78_full_outer",
    """WITH agg AS (
      |  SELECT c_nationkey, count(*) AS n_cust
      |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1)
      |SELECT n.n_name, agg.c_nationkey, agg.n_cust
      |FROM nation n FULL OUTER JOIN agg ON n.n_nationkey = agg.c_nationkey""".stripMargin) { (s, dir) =>
    val n = Tables.load(s, dir, "nation")
    val agg = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    n.join(agg, n("n_nationkey") === agg("c_nationkey"), "full_outer")
      .select(n("n_name"), agg("c_nationkey"), agg("n_cust"))
  }

  /** NOT EXISTS + IN subqueries — Catalyst rewrites them to anti/semi
    * joins (no per-row subquery execution). */
  val qExistsIn: QueryDef = QueryDef(
    "q79_exists_in",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin)
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist /
    * first & last value. ORDER BY carries a unique tiebreak
    * (o_orderkey) so every function is total-order deterministic. */
  val qWindowExtras: QueryDef = QueryDef(
    "q80_window_extras",
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS price_quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  first_value(o_orderkey) OVER w AS cheapest_key,
      |  last_value(o_orderkey) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
      |FROM orders WHERE o_orderkey < 3000
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("price_quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(w).as("cheapest_key"),
        last(col("o_orderkey")).over(wFull).as("priciest_key"))
  }

  /** Higher-order array functions (codegen lambda land, no UDFs):
    * transform / filter / aggregate / exists — the array toolkit the
    * similarity operators build on. */
  val qHof: QueryDef = QueryDef(
    "q81_hof",
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id,
      |  len(toks) AS n_toks,
      |  len(list_filter(toks, x -> length(x) >= 6)) AS n_long,
      |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
      |  CAST(list_sum(list_transform(toks, x -> length(x) * length(x))) AS BIGINT) AS sumsq_len,
      |  len(list_filter(toks, x -> x LIKE 's%')) > 0 AS has_s_word
      |FROM t""".stripMargin) { (s, dir) =>
    val toks = filter(split(lower(col("text")), "[^a-z]+"), t => t =!= "")
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(filter(col("toks"), t => length(t) >= 6)).as("n_long"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
          .as("total_len"),
        aggregate(col("toks"), lit(0L),
          (acc, x) => acc + length(x).cast("long") * length(x))
          .as("sumsq_len"),
        exists(col("toks"), t => t.startsWith("s")).as("has_s_word"))
  }

  /** Fixed-origin histogram binning — bins are data-independent
    * (floor(x / width)), so the layout survives any scale-up without a
    * min/max pre-pass. */
  val qHistogram: QueryDef = QueryDef(
    "q89_histogram",
    """SELECT o_orderstatus,
      |  CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
      |  count(*) AS n,
      |  round(min(o_totalprice), 2) AS bin_min,
      |  round(max(o_totalprice), 2) AS bin_max
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"),
        floor(col("o_totalprice") / 25000.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("bin_min"),
        round(max(col("o_totalprice")), 2).as("bin_max"))
  }

  /** Per-group z-score feature scaling with HAND-ROLLED moments
    * (integer-exact sum/sumsq, then one broadcast join back) — the
    * two-pass normalize that engine stddev aggregates (Welford order-
    * dependent) cannot reproduce bit-identically across engines. */
  val qZscore: QueryDef = QueryDef(
    "q90_zscore",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
      |  round((l.l_quantity - CAST(m.s AS DOUBLE) / m.n) /
      |    sqrt(greatest(
      |      (CAST(m.s2 AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
      |        / greatest(m.n - 1, 1), 1e-300)), 6)
      |    AS z
      |FROM lineitem l JOIN m USING (l_returnflag)
      |WHERE l.l_orderkey < 500""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val q = col("l_quantity").cast("bigint")
    val m = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(q).as("s"), sum(q * q).as("s2"))
    // degenerate-group guards mirror the oracle exactly: n=1 → divide
    // by 1 not 0 (DuckDB NULLs, Spark Infs); variance floored at a
    // positive epsilon (DuckDB sqrt(negative) hard-errors on float
    // cancellation, Spark returns NaN)
    val mean = col("s").cast("double") / col("n")
    val variance = greatest(
      (col("s2").cast("double") - col("s").cast("double") * col("s") / col("n")) /
        greatest(col("n") - 1, lit(1L)), lit(1e-300))
    li.filter(col("l_orderkey") < 500)
      .join(broadcast(m), Seq("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"),
        round((col("l_quantity") - mean) / sqrt(variance), 6).as("z"))
  }

  /** Incrementally maintained distinct counts ([[graft.scale
    * .Cardinality]]): per-batch HLL sketch deltas (the only state
    * ever persisted) roll up by UNION to per-batch AND global
    * estimates — distinct is not additive, sketches are mergeable —
    * with the relative error against exact counts gated in-plan at
    * 5% (DataSketches determinism makes the gate stable). The oracle
    * checks the exact counts and the (asserted) bound flag; the
    * estimate itself is sketch-internal and stays out of the hash. */
  val qHllIncremental: QueryDef = QueryDef(
    "q155_hll_incremental",
    """SELECT 'batch0' AS scope, CAST(count(DISTINCT user_id) AS BIGINT)
      |    AS n_exact, true AS within_bound
      |FROM events WHERE event_id % 3 = 0
      |UNION ALL
      |SELECT 'batch1', CAST(count(DISTINCT user_id) AS BIGINT), true
      |FROM events WHERE event_id % 3 = 1
      |UNION ALL
      |SELECT 'batch2', CAST(count(DISTINCT user_id) AS BIGINT), true
      |FROM events WHERE event_id % 3 = 2
      |UNION ALL
      |SELECT 'global', CAST(count(DISTINCT user_id) AS BIGINT), true
      |FROM events""".stripMargin) { (s, dir) =>
    import graft.scale.Cardinality
    val ev = Tables.load(s, dir, "events")
      .withColumn("scope",
        concat(lit("batch"), (col("event_id") % 3).cast("string")))
    // three "daily" batch deltas (one scan; append-equivalent by union
    // algebra) + the global rollup re-keyed from the SAME sketch rows
    val deltas = Cardinality.sketchDelta(ev, "user_id", Seq("scope"))
    val allDeltas = deltas.unionByName(
      deltas.select(lit("global").as("scope"), col("sketch")))
    val exact = ev.select(col("scope"), col("user_id"))
      .unionByName(ev.select(lit("global").as("scope"), col("user_id")))
      .groupBy("scope").agg(countDistinct(col("user_id")).as("n_exact"))
    Cardinality.estimateChecked(allDeltas, exact, Seq("scope"),
        relErrBound = 0.05)
      .select("scope", "n_exact", "within_bound")
  }

  val all: Seq[QueryDef] = Seq(qRollup, qPivot, qPercentiles, qCorrelated,
    qCube, qGroupingSets, qFullOuter, qExistsIn, qWindowExtras, qHof,
    qHistogram, qZscore, qHllIncremental)
}
