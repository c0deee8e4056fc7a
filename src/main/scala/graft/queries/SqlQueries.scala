package graft.queries

import graft.QueryDef
import graft.core.{Money, Skew, Tables}
import org.apache.spark.sql.functions._

/** SQL-entry, lineage, approx-distinct and skew queries (S6/P8/A10,
  * S15, §2.4 extension, §7 risk 6). */
object SqlQueries {

  /** P8/S6/A10: dynamic SQL through Catalyst's parser over registered
    * table names — the audit executors' `spark.sql(...)` path — with a
    * summary-agg body (COUNT/COUNT DISTINCT/SUM/MAX). */
  val qSqlEntry: QueryDef = QueryDef(
    "q52_sql_entry",
    s"""SELECT o_orderstatus,
      |  count(*) AS n,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  ${Money.moneySumSql("o_totalprice")} AS total,
      |  max(o_orderdate) AS max_od
      |FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT o_orderstatus,
        |  count(*) AS n,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  ${Money.moneySumSql("o_totalprice")} AS total,
        |  max(o_orderdate) AS max_od
        |FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderstatus""".stripMargin)
  }

  /** S15: row lineage via the file-metadata column (Spark 4's
    * `_metadata.file_path`, successor of input_file_name). Lineage is
    * grouped by the TABLE-RELATIVE path segment (the first `*.parquet`
    * component — `documents.parquet` whether the table is one file or
    * a directory of part files), so the same oracle holds on the
    * driver's single-file layout AND GenScale's multi-file dirs; the
    * per-part-file grain stays available by grouping the raw
    * `_metadata.file_path` instead. */
  val qFileLineage: QueryDef = QueryDef(
    "q53_file_lineage",
    "SELECT 'documents.parquet' AS source_file, count(*) AS n FROM documents") { (s, dir) =>
    s.read.parquet(s"$dir/documents.parquet")
      .select(regexp_extract(col("_metadata.file_path"),
          "([^/]+\\.parquet)", 1)
        .as("source_file"))
      .groupBy("source_file").agg(count(lit(1)).as("n"))
  }

  /** approx_count_distinct (HLL++) — the sketch estimate itself is
    * engine-specific, so the ORACLE checks a bounded-error contract:
    * the Spark output carries the exact distinct counts (hash-compared
    * against DuckDB's) plus `within_5pct` — true iff the HLL estimate
    * landed within 5% of exact — which must hash-equal the oracle's
    * literal TRUE on every row. A drifting sketch therefore FAILS the
    * oracle compare, not just a spec assertion. */
  val qApproxDistinct: QueryDef = QueryDef(
    "q54_approx_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS exact,
      |  TRUE AS within_5pct
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      // Pre-distinct the (flag, orderkey) pairs, then run BOTH the
      // exact count and the HLL sketch over the distinct stream
      // (round-14: combining countDistinct with approx_count_distinct
      // in one agg made Spark's distinct rewrite evaluate a partial
      // HLL sketch PER (flag, orderkey) GROUP — one 410-word buffer
      // per distinct key, measured 7.8 s CPU at sf0.1; this shape
      // keeps the pre-shuffle aggregate narrow and builds 3 sketches
      // total, 0.5 s CPU). HLL registers are max-merged, so a sketch
      // over the distinct keys is BIT-IDENTICAL to one over the raw
      // stream — duplicate insensitivity is the sketch's defining
      // property — and `exact` = the distinct-pair count by
      // construction. Same rows, same hash, one fewer Exchange of
      // sketch buffers.
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_orderkey")).agg(Map.empty[String, String])
        .groupBy(col("l_returnflag"))
        .agg(
          count(col("l_orderkey")).as("exact"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
        .withColumn("within_5pct",
          abs(col("approx") - col("exact")) <= col("exact") * 0.05)
        .drop("approx")
    }

  /** Salted join: same result as the plain join (oracle proves it) with
    * the hot-key shuffle spread over salt buckets. */
  val qSaltedJoin: QueryDef = QueryDef(
    "q55_salted_join",
    """SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) { (s, dir) =>
    Skew.saltedJoin(
      Tables.load(s, dir, "orders"),
      Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey"),
      keys = Seq("o_custkey"), buckets = 8)
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
  }

  /** Compaction maintenance op (BASELINE "read/write + compaction"):
    * many small files → few large ones, content bit-identical (the
    * oracle proves content; the file count is embedded as a column). */
  val qCompaction: QueryDef = QueryDef(
    "q59_compaction",
    """SELECT o_orderkey, o_custkey, o_totalprice, 4 AS n_files
      |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin) { (s, dir) =>
    val io = new graft.ingest.ParquetTableIO(
      java.nio.file.Files.createTempDirectory("graft_compact").toString)
    io.overwrite(Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(32), "t")
    io.compact(s, "t", numFiles = 4)
    io.read(s, "t").withColumn("n_files", lit(io.read(s, "t").inputFiles.length))
  }

  /** As-of join: each purchase enriched with the user's most recent
    * click at-or-before it — DuckDB's native ASOF JOIN is the oracle
    * for the composed union+window implementation. */
  val qAsOfJoin: QueryDef = QueryDef(
    "q60_asof_join",
    """SELECT l.event_id, l.user_id, l.ts, l.value,
      |  r.ts AS asof_ts, r.value AS asof_value
      |FROM (SELECT event_id, user_id, ts, value FROM events
      |      WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |                WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    graft.operators.AsOf.join(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"),
      ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value"),
      keyCol = "user_id", tsCol = "ts")
  }

  /** The SAME as-of semantics through the native custom operator
    * (graft.plans.AsOfJoin: LogicalPlan + Strategy + sort-merge
    * SparkPlan) — identical oracle as q60; AsOfSpec asserts the two
    * implementations agree row-for-row and the plan contains
    * AsOfJoinExec with one exchange per side. */
  val qAsOfNative: QueryDef = QueryDef(
    "q88_asof_native",
    """SELECT l.event_id, l.user_id, l.ts, l.value,
      |  r.ts AS asof_ts, r.value AS asof_value
      |FROM (SELECT event_id, user_id, ts, value FROM events
      |      WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |                WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    graft.operators.AsOf.joinNative(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"),
      ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value"),
      keyCol = "user_id", tsCol = "ts")
  }

  /** Bucketed range join: events × 36-hour maintenance-style windows
    * (one per day) — equi-join on time bucket + residual BETWEEN, not a
    * nested-loop theta join. Oracle = the naive theta join (exact). */
  val qRangeJoin: QueryDef = QueryDef(
    "q61_range_join",
    """WITH intervals AS (
      |  SELECT i AS interval_id,
      |    TIMESTAMP '2024-01-01' + (INTERVAL 1 DAY) * i AS start_ts,
      |    TIMESTAMP '2024-01-01' + (INTERVAL 1 DAY) * i + INTERVAL 36 HOUR AS end_ts
      |  FROM generate_series(0, 29) t(i))
      |SELECT i.interval_id, count(*) AS n_events,
      |  round(sum(e.value), 2) AS total_value
      |FROM events e JOIN intervals i
      |  ON e.ts >= i.start_ts AND e.ts < i.end_ts
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val intervals = s.range(0, 30).select(
      col("id").as("interval_id"),
      expr("timestampadd(DAY, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00')")
        .as("start_ts"))
      .withColumn("end_ts", expr("timestampadd(HOUR, 36, start_ts)"))
    graft.operators.RangeJoin.pointInInterval(
      Tables.load(s, dir, "events"), intervals,
      ptCol = "ts", startCol = "start_ts", endCol = "end_ts",
      bucketWidth = 86400L)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Typed Aggregator UDAF (geometric mean) registered for SQL — the
    * custom-aggregate path whose log-domain partials merge
    * associatively on any partitioning. Oracle = exp(avg(ln x)). */
  val qUdafGeomean: QueryDef = QueryDef(
    "q97_udaf_geomean",
    """SELECT o_orderstatus, count(*) AS n,
      |  round(exp(avg(ln(o_totalprice))), 2) AS geo_mean
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.udf.register("geo_mean",
      org.apache.spark.sql.functions.udaf(
        graft.functions.GeoMean, org.apache.spark.sql.Encoders.DOUBLE))
    s.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |  round(geo_mean(o_totalprice), 2) AS geo_mean
        |FROM orders GROUP BY 1""".stripMargin)
  }

  /** Partition-pruned scan: write partitioned by status, read one
    * partition — the scan lists only that directory (PlanSpec asserts
    * PartitionFilters; at 100 TB this is the difference between
    * scanning a shard and scanning the lake). */
  val qPartitionPrune: QueryDef = QueryDef(
    "q98_partition_prune",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 400000""".stripMargin) { (s, dir) =>
    partitionedOrdersDf(s, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 400000)
      .select("o_orderkey", "o_totalprice")
  }

  /** Partitioned copy of orders, cached per sfDir. */
  private val partCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def partitionedOrdersDf(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val out = partCache.computeIfAbsent(dir, { d =>
      val o = java.nio.file.Files.createTempDirectory("graft_part").toString
      Tables.load(s, d, "orders").write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(o)
      o
    })
    s.read.parquet(out)
  }

  val all: Seq[QueryDef] = Seq(qSqlEntry, qFileLineage, qApproxDistinct,
    qSaltedJoin, qCompaction, qAsOfJoin, qAsOfNative, qRangeJoin,
    qUdafGeomean, qPartitionPrune)
}
