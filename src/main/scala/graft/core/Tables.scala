package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table access for the test star schema (TESTDATA.md).
  *
  * Mirrors the reference's catalog-table source (S6,
  * uber/bronze2_to_silver.py:43) without a Hive metastore: tables are
  * resolved by name under a scale-factor directory. At cluster scale the
  * same code path works against any `spark.read.parquet`-able location
  * (S3A, HDFS); nothing here is local-mode specific.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session memo of resolved source frames (round-14): every
    * `spark.read.parquet` call re-resolves the datasource — footer
    * schema read + file listing, measured ~60 ms per call — and a
    * bench pass calls load() hundreds of times for the same ten
    * immutable tables. The memo returns the SAME lazy plan object
    * (no data is cached — every action still scans the parquet), so
    * this is deduplicated plan RESOLUTION, not result caching.
    * Contract (unchanged from the engine's general posture): the
    * star-schema sources are immutable for a session's lifetime.
    * Keyed weakly by session so a retired session's plans are
    * collectable; per-session maps are tiny (≤ tables × dirs). */
  private val resolved =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = resolved.synchronized {
      var m = resolved.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String),
          DataFrame]()
        resolved.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name),
      _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    // events.parquet's `ts` column has shipped as TIMESTAMP(NANOS) —
    // which Spark's vectorized reader rejects outright — and as plain
    // TIMESTAMP(MICROS). Handle both by inspecting the read schema:
    // nanos surface as LONG (legacy.parquet.nanosAsLong) and convert
    // with integral division (floor — matches DuckDB's ns→us
    // truncation); micros surface as TIMESTAMP_NTZ and cast to
    // session-tz TIMESTAMP (UTC everywhere here, so the instants are
    // identical and downstream watermarks/windows see one type).
    if (name == "events") {
      // stays set for the session: only affects NANOS-typed columns,
      // and must be live at physical-planning time, not just here.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integral `div` — double division would lose precision above
          // 2^53 (epoch-nanos ≈ 1.7e18)
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  private val MarkerKey = "graft.tables.registeredDir"

  /** Register every table as a temp view so `spark.sql` works against
    * the same names the DuckDB oracle uses. Idempotent per (session,
    * dir) via SESSION-scoped state (a conf marker + a catalog probe) —
    * repeated callers pay the view-creation planning cost once, a
    * fresh session (empty catalog, no marker) re-registers, and no
    * global memo can outlive or collide across sessions. Synchronized
    * so concurrent callers with different dirs cannot interleave view
    * creation and leave a mixed catalog behind. */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    val current = spark.conf.getOption(MarkerKey)
    if (!current.contains(dir) || !spark.catalog.tableExists(names.last)) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(MarkerKey, dir)
    }
  }
}
