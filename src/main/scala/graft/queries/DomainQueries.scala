package graft.queries

import graft.QueryDef
import graft.clean.Cleaning
import graft.core.{Cols, Tables}
import org.apache.spark.sql.functions._

/** Composite per-domain silver transforms — each reference pipeline's
  * distinctive operator chain as one checked query, so every pipeline a
  * reference user runs today has a named engine counterpart
  * (uber = MedallionSpec + q1; coin/stocks/news below). Domain inputs
  * are synthesized deterministically from the star schema so the oracle
  * can rebuild them.
  */
object DomainQueries {

  /** coin_bronze2_to_silver.py shape: json_normalize-style DOTTED
    * column names (P11 backtick refs), latest-wins dedup per coin id
    * (W2), tags-array flatten via concat_ws, key columns reordered to
    * the front (P2). */
  val qCoinSilver: QueryDef = QueryDef(
    "q63_coin_silver",
    """WITH bronze AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |    c_acctbal AS "quote.usd.price",
      |    c_acctbal * 2 AS "quote.usd.market_cap",
      |    concat(c_mktsegment, ',seg,', CAST(c_nationkey AS VARCHAR)) AS tags_csv,
      |    c_custkey % 3 AS batch
      |  FROM customer),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY batch DESC) rn
      |    FROM bronze) WHERE rn = 1)
      |SELECT id, name, "quote.usd.price", "quote.usd.market_cap", tags_csv
      |FROM dedup WHERE "quote.usd.price" > 0""".stripMargin) { (s, dir) =>
    // bronze2 frame with the dotted names json_normalize produces
    val bronze = Tables.load(s, dir, "customer").select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_acctbal").as("quote.usd.price"),
      (col("c_acctbal") * 2).as("quote.usd.market_cap"),
      array(col("c_mktsegment"), lit("seg"),
        col("c_nationkey").cast("string")).as("tags"),
      (col("c_custkey") % 3).as("batch"))
    val deduped = Cleaning.dedupLatestWins(bronze, Seq("id"),
      Seq(col("batch").desc))
    Cols.reorderFront(
      deduped
        .withColumn("tags_csv", concat_ws(",", col("tags"))).drop("tags")
        .filter(Cols.safeCol("quote.usd.price") > 0),
      Seq("id", "name"))
      .drop("batch")
  }

  /** alphavantage/bronze2_to_silver.py shape: timestamp-pattern parse,
    * OHLC sanity conjunction (P6), derived date/hour/avg_price,
    * dedup on (symbol, timestamp). */
  val qStocksSilver: QueryDef = QueryDef(
    "q64_stocks_silver",
    """WITH bronze AS (
      |  SELECT concat('SYM', CAST(l_suppkey % 7 AS VARCHAR)) AS symbol,
      |    l_shipdate AS ts, -- Spark side round-trips through the
      |                      -- yyyy-MM-dd'T'HH:mm:ss.SSS pattern; the
      |                      -- values are identical
      |    l_extendedprice AS open_p,
      |    l_extendedprice * (1 + l_tax) AS high_p,
      |    l_extendedprice * (1 - l_discount) AS low_p,
      |    l_extendedprice * (1 + l_tax - l_discount) AS close_p,
      |    l_quantity AS volume,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |parsed AS (SELECT * FROM bronze),
      |valid AS (
      |  SELECT * FROM parsed
      |  WHERE ts IS NOT NULL AND open_p > 0 AND high_p > 0 AND low_p > 0
      |    AND close_p > 0 AND volume >= 0
      |    AND low_p <= open_p AND open_p <= high_p
      |    AND low_p <= close_p AND close_p <= high_p AND low_p <= high_p),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY symbol, ts
      |      -- total order: duplicate (orderkey, linenumber) pairs exist,
      |      -- so the measure columns join the ordering (same tuple the
      |      -- engine's min-struct compares)
      |      ORDER BY l_orderkey, l_linenumber, open_p, high_p, low_p,
      |               close_p, volume) rn FROM valid) WHERE rn = 1)
      |SELECT symbol, ts, open_p, high_p, low_p, close_p, volume,
      |  CAST(ts AS DATE) AS trade_date,
      |  date_part('hour', ts) AS trade_hour,
      |  round((high_p + low_p) / 2, 5) AS avg_price
      |FROM dedup""".stripMargin) { (s, dir) =>
    // Round-14 shape (guide §2.5 unsplittable-input remedy): the
    // pattern format+parse battery is this query's dominant CPU, and a
    // single-row-group bronze file caps scan parallelism at the file
    // count. When the scan underfills the session's cores,
    // HASH-repartition the RAW columns by the (unique, skew-free)
    // line key BEFORE any expensive projection: the scan stage then
    // only reads and re-keys narrow raw bytes (hash repartitioning
    // pays no sort-before-repartition, unlike round-robin), and the
    // format/parse/validity/aggregate work all runs on every core. At
    // production file counts the guard is false and no extra exchange
    // is paid; the dedup is a min-struct aggregate, insensitive to
    // row placement.
    val liRaw = Tables.load(s, dir, "lineitem").select(
      "l_suppkey", "l_shipdate", "l_extendedprice", "l_tax",
      "l_discount", "l_quantity", "l_orderkey", "l_linenumber")
    val li =
      if (liRaw.inputFiles.length < s.sparkContext.defaultParallelism)
        liRaw.repartition(s.sparkContext.defaultParallelism,
          col("l_orderkey"), col("l_linenumber"))
      else liRaw
    val bronze = li.select(
      concat(lit("SYM"), (col("l_suppkey") % 7).cast("string")).as("symbol"),
      date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("ts_raw"),
      col("l_extendedprice").as("open_p"),
      (col("l_extendedprice") * (lit(1) + col("l_tax"))).as("high_p"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("low_p"),
      (col("l_extendedprice") * (lit(1) + col("l_tax") - col("l_discount")))
        .as("close_p"),
      col("l_quantity").as("volume"),
      col("l_orderkey"), col("l_linenumber"))
    val parsed = bronze.withColumn("ts",
      to_timestamp(col("ts_raw"), "yyyy-MM-dd'T'HH:mm:ss.SSS")).drop("ts_raw")
    val valid = Cleaning.validityFilter(parsed, Seq(
      col("ts").isNotNull,
      col("open_p") > 0, col("high_p") > 0, col("low_p") > 0,
      col("close_p") > 0, col("volume") >= 0,
      col("low_p") <= col("open_p"), col("open_p") <= col("high_p"),
      col("low_p") <= col("close_p"), col("close_p") <= col("high_p"),
      col("low_p") <= col("high_p")))
    // (symbol, ts) is near-unique → agg-based dedup (hash agg, no
    // sort-window) picks the same min-(orderkey, linenumber) row
    Cleaning.dedupFirstByKey(valid, Seq("symbol", "ts"),
      Seq("l_orderkey", "l_linenumber"))
      .select(col("symbol"), col("ts"), col("open_p"), col("high_p"),
        col("low_p"), col("close_p"), col("volume"),
        to_date(col("ts")).as("trade_date"),
        hour(col("ts")).as("trade_hour"),
        round((col("high_p") + col("low_p")) / 2, 5).as("avg_price"))
  }

  /** finance_bronze2_to_silver.py shape: sha2(lower(url)) article ids,
    * CR/LF regexp cleanup, nested struct source.name projection,
    * latest-wins dedup with desc_nulls_last. */
  val qNewsSilver: QueryDef = QueryDef(
    "q65_news_silver",
    """WITH bronze AS (
      |  SELECT concat('https://ex.com/', CAST(doc_id % 400 AS VARCHAR)) AS url,
      |    concat(substr(text, 1, 40), chr(13), chr(10), 'tail') AS content,
      |    {'id': source, 'name': upper(source)} AS src,
      |    doc_id
      |  FROM documents),
      |cleaned AS (
      |  SELECT sha256(lower(url)) AS article_id,
      |    url,
      |    trim(regexp_replace(content, '[\r\n]+', ' ', 'g')) AS content,
      |    src.name AS source_name,
      |    doc_id
      |  FROM bronze WHERE url IS NOT NULL)
      |SELECT article_id, url, content, source_name FROM (
      |  SELECT *, row_number() OVER (PARTITION BY article_id
      |    ORDER BY doc_id DESC NULLS LAST) rn FROM cleaned) WHERE rn = 1""".stripMargin) { (s, dir) =>
    val bronze = Tables.load(s, dir, "documents").select(
      concat(lit("https://ex.com/"), (col("doc_id") % 400).cast("string"))
        .as("url"),
      concat(substring(col("text"), 1, 40), lit("\r\n"), lit("tail"))
        .as("content"),
      struct(col("source").as("id"), upper(col("source")).as("name"))
        .as("src"),
      col("doc_id"))
    val cleaned = bronze
      .filter(col("url").isNotNull)
      .select(
        sha2(lower(col("url")), 256).as("article_id"),
        col("url"),
        trim(regexp_replace(col("content"), "[\\r\\n]+", " ")).as("content"),
        col("src.name").as("source_name"),
        col("doc_id"))
    Cleaning.dedupLatestWins(cleaned, Seq("article_id"),
      Seq(col("doc_id").desc_nulls_last))
      .select("article_id", "url", "content", "source_name")
  }

  /** uber bronze2_to_silver.py shape: spaced raw headers sanitized
    * (P1), validity conjunction (P6), latest-wins dedup per trip (W2),
    * derived value_per_km + trip_minutes (the reference's signature
    * features). Completes the four-domain set (coin/stocks/news/uber)
    * as named oracle-checked queries.
    *
    * value_per_km rounds at 8: fare sits on a 4-decimal lattice and
    * distances are integers ≤10, so quotients live on a ≤7-decimal
    * lattice (÷8 = ×0.125) — rounding AT or BELOW the lattice digits
    * is a Spark-vs-DuckDB coin flip (found empirically at 4 and 6). */
  val qUberSilver: QueryDef = QueryDef(
    "q101_uber_silver",
    """WITH bronze AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS trip_id,
      |    l_shipdate AS pickup_datetime,
      |    l_shipdate + INTERVAL 1 MINUTE * CAST(l_quantity AS INT) AS dropoff_datetime,
      |    round(l_discount * 100, 2) AS trip_distance,
      |    l_extendedprice / 100 AS fare_amount,
      |    l_suppkey % 5 AS batch
      |  FROM lineitem),
      |valid AS (
      |  SELECT * FROM bronze
      |  WHERE trip_distance > 0 AND fare_amount > 0
      |    AND dropoff_datetime > pickup_datetime),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY trip_id
      |      ORDER BY batch DESC, fare_amount DESC, trip_distance DESC,
      |               pickup_datetime DESC) rn
      |    FROM valid) WHERE rn = 1)
      |SELECT trip_id, pickup_datetime, dropoff_datetime, trip_distance,
      |  fare_amount,
      |  round(fare_amount / trip_distance, 8) AS value_per_km,
      |  CAST((epoch(dropoff_datetime) - epoch(pickup_datetime)) / 60 AS BIGINT)
      |    AS trip_minutes
      |FROM dedup""".stripMargin) { (s, dir) =>
    val raw = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("trip id"),
      col("l_shipdate").as("pickup datetime"),
      expr("timestampadd(MINUTE, CAST(l_quantity AS INT), l_shipdate)")
        .as("dropoff datetime"),
      round(col("l_discount") * 100, 2).as("trip distance"),
      (col("l_extendedprice") / 100).as("fare amount"),
      (col("l_suppkey") % 5).as("batch"))
    val sane = Cols.sanitizeNames(raw)
    val valid = Cleaning.validityFilter(sane, Seq(
      col("trip_distance") > 0, col("fare_amount") > 0,
      col("dropoff_datetime") > col("pickup_datetime")))
    val deduped = Cleaning.dedupLatestWins(valid, Seq("trip_id"), Seq(
      col("batch").desc, col("fare_amount").desc,
      col("trip_distance").desc, col("pickup_datetime").desc))
    deduped
      .withColumn("value_per_km",
        round(col("fare_amount") / col("trip_distance"), 8))
      .withColumn("trip_minutes",
        ((unix_timestamp(col("dropoff_datetime")) -
          unix_timestamp(col("pickup_datetime"))) / 60).cast("bigint"))
      .drop("batch")
  }

  val all: Seq[QueryDef] =
    Seq(qCoinSilver, qStocksSilver, qNewsSilver, qUberSilver)
}
