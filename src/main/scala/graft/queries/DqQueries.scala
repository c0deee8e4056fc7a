package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.dq._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Data-quality framework queries (SURVEY §2.11): config-driven rule
  * evaluation, JSON envelopes, fact explode. Dirty data is synthesized
  * deterministically from orders so the oracle can reproduce it. */
object DqQueries {

  private val checkedAt = "2026-01-01 00:00:00"

  /** The audited frame: orders with injected NULLs and blanks. */
  private def dirtyOrders(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_orderkey") % 11 === 0, lit(null))
        .when(col("o_orderkey") % 13 === 0, lit(" "))
        .otherwise(col("o_orderpriority")).as("prio"),
      when(col("o_orderkey") % 17 === 0, lit(null))
        .otherwise(col("o_custkey")).as("cust"),
      col("o_totalprice"), col("o_orderdate"))

  private val oracleBase =
    """base AS (SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |       WHEN o_orderkey % 13 = 0 THEN ' '
      |       ELSE o_orderpriority END AS prio,
      |  CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_custkey END AS cust,
      |  o_totalprice, o_orderdate FROM orders)""".stripMargin

  private val cfgs: Seq[RuleConfig] = Seq(
    MandatoryColumnConfig(1, "silver", "orders_dirty",
      mandatoryColumns = Seq("prio"), pkColumns = Seq("o_orderkey")),
    MandatoryColumnConfig(2, "silver", "orders_dirty",
      mandatoryColumns = Seq("prio", "cust"), pkColumns = Seq("o_orderkey")),
    ValidityConfig(3, "silver", "orders_dirty",
      validationRule = "o_totalprice > 350000", pkColumns = Seq("o_orderkey")),
    ValidityConfig(4, "silver", "orders_dirty",
      validationRule = "cust IS NOT NULL AND cust % 100 = 7",
      pkColumns = Seq("o_orderkey"),
      additionalFilter = Some("o_totalprice > 100000")))

  /** Mixed completeness+validity audit, all four rules in ONE scan;
    * envelopes round-tripped through to_json/from_json. */
  val qDqAudit: QueryDef = QueryDef(
    "q29_dq_audit",
    s"""WITH $oracleBase,
       |r1 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE prio IS NULL OR trim(prio) = ''),
       |r2 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE prio IS NULL OR trim(prio) = ''
       |          OR cust IS NULL OR trim(CAST(cust AS VARCHAR)) = ''),
       |r3 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE o_totalprice > 350000),
       |r4 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE o_totalprice > 100000 AND cust IS NOT NULL AND cust % 100 = 7),
       |u AS (
       |  SELECT 1 AS cd, 'completeness_mandatory' AS dim,
       |    (SELECT count(*) FROM r1) n, (SELECT min(pk) FROM r1) pk1
       |  UNION ALL SELECT 2, 'completeness_mandatory',
       |    (SELECT count(*) FROM r2), (SELECT min(pk) FROM r2)
       |  UNION ALL SELECT 3, 'validity',
       |    (SELECT count(*) FROM r3), (SELECT min(pk) FROM r3)
       |  UNION ALL SELECT 4, 'validity',
       |    (SELECT count(*) FROM r4), (SELECT min(pk) FROM r4))
       |SELECT CAST(cd AS BIGINT) AS cd_configuration, dim AS ds_dimension,
       |  sha256(dim || '|' || CAST(cd AS VARCHAR) || '|' || '$checkedAt')
       |    AS cd_dataaudit_result,
       |  n AS n_violations,
       |  CAST(least(n, 999) AS BIGINT) AS pk_n,
       |  pk1 AS pk_first,
       |  CASE WHEN n = 0 THEN 1 ELSE 0 END AS nr_status
       |FROM u""".stripMargin) { (s, dir) =>
    val results = AuditExecutor.runRules(dirtyOrders(s, dir), cfgs, checkedAt)
    val chk = DataType.fromDDL(
      "STRUCT<n_violations: BIGINT, pk_sample: ARRAY<STRING>>")
    results
      .withColumn("chk", from_json(col("ds_checked_value"), chk))
      .select(
        col("cd_configuration"),
        col("ds_dimension"),
        col("cd_dataaudit_result"),
        col("chk.n_violations").as("n_violations"),
        size(col("chk.pk_sample")).cast("bigint").as("pk_n"),
        element_at(col("chk.pk_sample"), 1).as("pk_first"),
        col("nr_status"))
  }

  /** Full DQ pipeline to the violation-grain fact table: rules (one with
    * a broken expression → ERROR row) → envelopes → from_json +
    * explode_outer → labeled fact rows. Sample cap 5 for a tidy fact. */
  val qDqFact: QueryDef = QueryDef(
    "q30_dq_fact",
    s"""WITH $oracleBase,
       |r1 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE prio IS NULL OR trim(prio) = ''),
       |r3 AS (SELECT CAST(o_orderkey AS VARCHAR) pk FROM base
       |       WHERE o_totalprice > 350000),
       |f1 AS (SELECT CAST(1 AS BIGINT) AS cd_configuration,
       |         'completeness_mandatory' AS ds_dimension, 'FAIL' AS status_label,
       |         (SELECT count(*) FROM r1) AS n_violations, pk AS violated_pk
       |       FROM r1 ORDER BY pk LIMIT 5),
       |f3 AS (SELECT CAST(3 AS BIGINT), 'validity', 'FAIL',
       |         (SELECT count(*) FROM r3), pk
       |       FROM r3 ORDER BY pk LIMIT 5)
       |SELECT * FROM f1 UNION ALL SELECT * FROM f3
       |UNION ALL SELECT CAST(5 AS BIGINT), 'validity', 'ERROR',
       |  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)""".stripMargin) { (s, dir) =>
    val withBad = Seq(cfgs.head, cfgs(2),
      ValidityConfig(5, "silver", "orders_dirty",
        validationRule = "no_such_column > 0", pkColumns = Seq("o_orderkey")))
    val results = AuditExecutor.runRulesSafe(dirtyOrders(s, dir), withBad,
      checkedAt, sampleCap = 5)
    FactBuilder.violations(results)
      .select("cd_configuration", "ds_dimension", "status_label",
        "n_violations", "violated_pk")
  }

  /** Multi-table audit run: rules over orders + lineitem + events,
    * grouped to one scan per table, results unioned (the full
    * framework shape of 001→002→004). */
  val qDqMultiTable: QueryDef = QueryDef(
    "q62_dq_multi_table",
    """WITH c AS (
      |  SELECT CAST(10 AS BIGINT) AS cd_configuration, 'validity' AS ds_dimension,
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0 OR o_totalprice IS NULL) AS n_violations
      |  UNION ALL SELECT 11, 'completeness_mandatory',
      |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL
      |       OR trim(o_orderpriority) = '')
      |  UNION ALL SELECT 12, 'validity',
      |    (SELECT count(*) FROM lineitem
      |     WHERE NOT (l_discount BETWEEN 0 AND 0.1) OR l_quantity <= 0)
      |  UNION ALL SELECT 13, 'validity',
      |    (SELECT count(*) FROM events WHERE value < 0 OR user_id < 0))
      |SELECT cd_configuration, ds_dimension, n_violations,
      |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS nr_status
      |FROM c""".stripMargin) { (s, dir) =>
    val cfgs: Seq[RuleConfig] = Seq(
      ValidityConfig(10, "silver", "orders",
        "o_totalprice <= 0 OR o_totalprice IS NULL", Seq("o_orderkey")),
      MandatoryColumnConfig(11, "silver", "orders",
        Seq("o_orderpriority"), Seq("o_orderkey")),
      ValidityConfig(12, "silver", "lineitem",
        "NOT (l_discount BETWEEN 0 AND 0.1) OR l_quantity <= 0",
        Seq("l_orderkey", "l_linenumber")),
      ValidityConfig(13, "silver", "events",
        "value < 0 OR user_id < 0", Seq("event_id")))
    val chk = DataType.fromDDL(
      "STRUCT<n_violations: BIGINT, pk_sample: ARRAY<STRING>>")
    AuditRunner.runAll((_, table) => Tables.load(s, dir, table), cfgs, checkedAt)
      .withColumn("chk", from_json(col("ds_checked_value"), chk))
      .select(col("cd_configuration"), col("ds_dimension"),
        col("chk.n_violations").as("n_violations"), col("nr_status"))
  }

  /** Column profile (q182): the single-scan table summary a DQ audit
    * config is derived from — per column: rows, nulls, exact distinct
    * cardinality (HLL cross-checked within 5%, the q54 contract),
    * typed min/max. The oracle recomputes every column's aggregates
    * independently and the verdict column must equal literal TRUE. */
  val qProfile: QueryDef = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num,
         |  CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str,
         |  CAST(NULL AS VARCHAR) AS max_str,
         |  TRUE AS sketch_ok
         |FROM orders""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  min($c) AS min_str, max($c) AS max_str,
         |  TRUE AS sketch_ok
         |FROM orders""".stripMargin
    def ts(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(epoch_us(min($c)) AS DOUBLE) AS min_num,
         |  CAST(epoch_us(max($c)) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str,
         |  CAST(NULL AS VARCHAR) AS max_str,
         |  TRUE AS sketch_ok
         |FROM orders""".stripMargin
    QueryDef(
      "q182_profile",
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
        num("o_totalprice"), ts("o_orderdate"), str("o_orderpriority"))
        .mkString("\nUNION ALL\n")) { (s, dir) =>
      Profile.profile(Tables.load(s, dir, "orders"))
    }
  }

  /** Exact distributed quantiles (q186): the percentile half of the
    * profile — value at 1-based sorted index ceil(p·N), the DISCRETE
    * convention both engines can compare bit-exactly (a selected
    * value, no interpolation arithmetic). The engine computes it via
    * the bin-decomposed rank (no global sort — Quantiles scaladoc);
    * the oracle is the naive global row_number the decomposition must
    * equal, and the GK-sketch verdict must be literal TRUE. */
  val qQuantiles: QueryDef = QueryDef(
    "q186_quantiles",
    """WITH v AS (
      |  SELECT o_totalprice AS x FROM orders WHERE o_totalprice IS NOT NULL),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |r AS (SELECT x, row_number() OVER (ORDER BY x ASC) AS rk FROM v),
      |p AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]) AS p),
      |t AS (SELECT p, CAST(ceil(p * n) AS BIGINT) AS idx
      |      FROM p CROSS JOIN n)
      |SELECT t.p, t.idx, r.x AS value, TRUE AS sketch_ok
      |FROM t JOIN r ON r.rk = t.idx""".stripMargin) { (s, dir) =>
    graft.scale.Quantiles.exactQuantiles(Tables.load(s, dir, "orders"),
      "o_totalprice", Seq(0.25, 0.5, 0.75, 0.95))
  }

  /** Per-group exact quantiles (q187): p50/p95 token counts PER
    * LANGUAGE on the documents table — the chunk-sizing /
    * length-threshold statistic a multilingual curation config derives
    * per stratum. Oracle: the naive per-group row_number the
    * (group, bin)-decomposed rank must equal. */
  val qQuantilesBy: QueryDef = QueryDef(
    "q187_lang_token_quantiles",
    """WITH v AS (
      |  SELECT lang,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |      x -> x <> '')) AS DOUBLE) AS x
      |  FROM documents),
      |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |r AS (SELECT lang, x,
      |        row_number() OVER (PARTITION BY lang ORDER BY x ASC) AS rk
      |      FROM v),
      |p AS (SELECT unnest([0.5, 0.95]::DOUBLE[]) AS p),
      |t AS (SELECT lang, p, CAST(ceil(p * n) AS BIGINT) AS idx
      |      FROM p CROSS JOIN n)
      |SELECT t.lang, t.p, t.idx, r.x AS value
      |FROM t JOIN r ON r.lang = t.lang AND r.rk = t.idx""".stripMargin) {
    (s, dir) =>
    import graft.scale.TextStats
    val docs = Tables.load(s, dir, "documents").select(col("lang"),
      size(TextStats.tokens(col("text"))).cast("double").as("n_tok"))
    graft.scale.Quantiles.exactQuantilesBy(docs, "lang", "n_tok",
      Seq(0.5, 0.95))
  }

  val all: Seq[QueryDef] =
    Seq(qDqAudit, qDqFact, qDqMultiTable, qProfile, qQuantiles, qQuantilesBy)
}
