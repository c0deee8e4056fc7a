package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ingest.ParquetTableIO
import graft.stream.{StreamIngest, StreamJoins, WindowedAggs}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming queries (SURVEY §2.10, S10/E3 + watermark
  * window extensions). Tumbling/sliding run as REAL streaming queries
  * (watermark + AvailableNow + memory sink); their oracles are the
  * batch-equivalent SQL — Spark's batch/stream agreement is the
  * property under test. */
object StreamQueries {

  private val seq = new AtomicInteger(0)
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Re-materialize events with micros timestamps for the streaming
    * source (the raw file's TIMESTAMP(NANOS) is unreadable — Tables
    * handles the conversion for batch; streaming needs a clean copy).
    * Cached per sfDir so the tumbling/sliding queries share one copy. */
  private val eventsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, org.apache.spark.sql.types.StructType)]()
  private def eventsDir(s: org.apache.spark.sql.SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) =
    eventsCache.computeIfAbsent(dir, { d =>
      val ev = Tables.load(s, d, "events")
      val out = tmp("graft_events")
      ev.write.mode("overwrite").parquet(out)
      (out, ev.schema)
    })

  /** Single-file projected copy of events (one micro-batch under
    * AvailableNow — for queries whose oracle needs single-batch
    * semantics); cached per (sfDir, projection tag). */
  private val singleFileCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, org.apache.spark.sql.types.StructType)]()
  private def singleFileEvents(s: org.apache.spark.sql.SparkSession,
      dir: String, tag: String)(
      project: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (String, org.apache.spark.sql.types.StructType) =
    singleFileCache.computeIfAbsent(dir + "#" + tag, { _ =>
      val ev = project(Tables.load(s, dir, "events"))
      val out = tmp("graft_events1")
      ev.coalesce(1).write.mode("overwrite").parquet(out)
      (out, ev.schema)
    })

  val qTumbling: QueryDef = QueryDef(
    "q36_stream_tumbling",
    """SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000 AS BIGINT)) AS window_start,
      |  make_timestamp(CAST((floor(epoch(ts) / 21600) + 1) * 21600000000 AS BIGINT)) AS window_end,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val (src, schema) = eventsDir(s, dir)
    WindowedAggs.runStreaming(s, src, schema, "ts", "1 hour",
      s"tumbling_${seq.incrementAndGet()}")(
      WindowedAggs.tumbling(_, "6 hours"))
  }

  val qSliding: QueryDef = QueryDef(
    "q37_stream_sliding",
    """WITH shifted AS (
      |  SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000 AS BIGINT)) AS w0, event_type FROM events
      |  UNION ALL
      |  SELECT make_timestamp(CAST((floor(epoch(ts) / 21600) - 1) * 21600000000 AS BIGINT)), event_type FROM events)
      |SELECT w0 AS window_start,
      |  w0 + INTERVAL 12 HOUR AS window_end,
      |  event_type, count(*) AS n
      |FROM shifted GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val (src, schema) = eventsDir(s, dir)
    WindowedAggs.runStreaming(s, src, schema, "ts", "1 hour",
      s"sliding_${seq.incrementAndGet()}")(
      WindowedAggs.sliding(_, "12 hours", "6 hours"))
  }

  /** session_window (batch plan — identical expression powers the
    * streaming mode); oracle = gaps-and-islands SQL. */
  val qSession: QueryDef = QueryDef(
    "q38_session_window",
    """WITH l AS (
      |  SELECT user_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, value,
      |    sum(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) >= 7200
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts
      |            ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM l)
      |SELECT min(ts) AS session_start,
      |  max(ts) + INTERVAL 2 HOUR AS session_end,
      |  user_id, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM g GROUP BY user_id, grp""".stripMargin) { (s, dir) =>
    WindowedAggs.session(Tables.load(s, dir, "events"), "2 hours")
  }

  /** S10/E3: end-to-end incremental CSV ingest — readStream +
    * AvailableNow + checkpoint + foreachBatch assigning surrogate ids
    * continuing from the target's max. Oracle: ids are deterministic
    * (natural-key ordered), so the whole ingested table is checkable. */
  val qStreamIngest: QueryDef = QueryDef(
    "q39_stream_ingest",
    """SELECT row_number() OVER (ORDER BY o_orderkey) AS cd_bronze_id,
      |  o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin) { (s, dir) =>
    val srcDir = tmp("graft_csv_src")
    val ckDir = tmp("graft_ck")
    val tblDir = tmp("graft_tbl")
    val src = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.write.mode("overwrite").option("header", "true").csv(srcDir)
    val io = new ParquetTableIO(tblDir)
    StreamIngest.ingestCsv(s, srcDir, ckDir, io, "bronze_orders",
      "cd_bronze_id", Seq("o_orderkey"), schema = Some(src.schema))
    io.read(s, "bronze_orders")
      .select("cd_bronze_id", "o_orderkey", "o_custkey", "o_totalprice")
  }

  /** flatMapGroupsWithState first-seen dedup as a real streaming query.
    * The source is a single parquet file → one micro-batch → first-seen
    * equals global min-ts per key, which the oracle reproduces. */
  val qStatefulDedup: QueryDef = QueryDef(
    "q56_stateful_dedup",
    """SELECT user_id AS key, ts, value FROM (
      |  SELECT user_id, ts, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin) { (s, dir) =>
    val (out, _) = singleFileEvents(s, dir, "keyed")(
      _.select(col("user_id").as("key"), col("ts"), col("value")))
    graft.stream.StatefulOps.runFirstSeen(s, out,
      s"stateful_${seq.incrementAndGet()}")
  }

  /** Stream-stream range join (view→purchase attribution) as a real
    * streaming query; single-file source → one micro-batch, so the
    * append-mode result equals the batch range join the oracle runs. */
  val qStreamStreamJoin: QueryDef = QueryDef(
    "q86_stream_stream_join",
    """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
      |  v.ts AS view_ts, p.ts AS purchase_ts
      |FROM events v JOIN events p ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE""".stripMargin) { (s, dir) =>
    val (out, schema) = singleFileEvents(s, dir, "typed")(
      _.select("event_id", "ts", "user_id", "event_type"))
    StreamJoins.runViewPurchase(s, out, schema,
      s"ssj_${seq.incrementAndGet()}", statePartitions = Some(4))
  }

  /** Built-in streaming dedup with bounded state:
    * dropDuplicatesWithinWatermark over (user_id, day) — dedup key is
    * the full projected row, so the kept row is value-identical however
    * batches split; state evicts as the watermark passes each day. */
  val qStreamDedup: QueryDef = QueryDef(
    "q94_stream_dedup",
    """SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      |FROM events""".stripMargin) { (s, dir) =>
    val (out, schema) = singleFileEvents(s, dir, "typed")(
      _.select("event_id", "ts", "user_id", "event_type"))
    graft.stream.StatefulOps.runDedupWithinWatermark(s, out, schema,
      s"sdedup_${seq.incrementAndGet()}") { df =>
      df.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .withWatermark("day", "1 day")
    }
  }

  /** Streaming CDC apply (the streaming MERGE-with-deletes): base table
    * seeded, then a single-file change stream reconciled via
    * foreachBatch + Cdc.apply — one micro-batch, so the result equals
    * the batch CDC semantics and SHARES q99's oracle. */
  val qStreamCdc: QueryDef = QueryDef(
    "q102_stream_cdc",
    IngestQueries.qCdcApply.oracle.get()) { (s, dir) =>
    import graft.ingest.ParquetTableIO
    val base = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    def slice(m: Int, r: Int) = base.filter(col("o_orderkey") % m === r)
    val changes =
      slice(5, 0).withColumn("op", lit("D")).withColumn("seq", lit(1))
        .unionByName(slice(5, 1)
          .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
          .withColumn("op", lit("U")).withColumn("seq", lit(1)))
        .unionByName(slice(10, 1)
          .withColumn("o_totalprice", round(col("o_totalprice") + 2000, 2))
          .withColumn("op", lit("U")).withColumn("seq", lit(2)))
        .unionByName(slice(5, 2)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("op", lit("I")).withColumn("seq", lit(1)))
    val srcDir = tmp("graft_cdc_src")
    changes.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val io = new ParquetTableIO(tmp("graft_cdc_tbl"))
    io.overwrite(base, "t")
    graft.stream.StreamIngest.ingestCdc(s, srcDir, tmp("graft_cdc_ck"),
      io, "t", Seq("o_orderkey"), "op", "seq", changes.schema)
    io.read(s, "t")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
  }

  /** Streaming incremental gold maintenance: per-batch partial KPIs
    * merged into the stored table by re-aggregation
    * ([[graft.stream.IncrementalGold]]). Count/sum are decomposable, so
    * the maintained table equals the batch aggregate however the
    * backlog was chunked — which is exactly what the batch-SQL oracle
    * checks. */
  val qStreamGold: QueryDef = QueryDef(
    "q104_stream_gold",
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val (src, schema) = eventsDir(s, dir)
    val io = new ParquetTableIO(tmp("graft_gold_tbl"))
    graft.stream.IncrementalGold.run(s, src, schema, tmp("graft_gold_ck"),
      io, "gold", Seq("event_type", "day")) { batch =>
      batch.groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("raw_total"))
    }
    graft.stream.IncrementalGold.read(s, io, "gold")
      .select(col("event_type"), col("day"), col("n"),
        round(col("raw_total"), 2).as("total_value"))
  }

  val all: Seq[QueryDef] = Seq(qTumbling, qSliding, qSession, qStreamIngest,
    qStatefulDedup, qStreamStreamJoin, qStreamDedup, qStreamCdc, qStreamGold)
}
