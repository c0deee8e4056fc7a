package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.functions.Sentiment
import org.apache.spark.sql.functions._

/** Scalar-function queries (SURVEY §2.8) + the sentiment UDF surface
  * (§2.9) + the explode generator (A9/004_fact shape). */
object FunctionQueries {

  /** String functions: sha2 id-hashing (the article_id pattern,
    * finance_bronze2_to_silver.py:91), concat_ws, substring, length,
    * regexp_replace, like. */
  val qStringFuncs: QueryDef = QueryDef(
    "q24_string_funcs",
    """SELECT c_custkey,
      |  sha256(lower(c_name)) AS name_id,
      |  concat_ws('|', c_name, c_mktsegment) AS joined,
      |  substring(c_name, 1, 9) AS name_prefix,
      |  length(c_name) AS name_len,
      |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
      |  CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
      |  trim(concat(' ', c_mktsegment, ' ')) AS seg_trim
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        sha2(lower(col("c_name")), 256).as("name_id"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        substring(col("c_name"), 1, 9).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
        when(col("c_name").like("%1%"), 1).otherwise(0).as("has_one"),
        trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("seg_trim"))
  }

  /** Date/time functions: to_date, date_format, year/month, date
    * arithmetic and day-diff — anchored on data (not wall-clock) for
    * determinism. */
  val qDateFuncs: QueryDef = QueryDef(
    "q25_date_funcs",
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  date_part('year', o_orderdate) AS y,
      |  date_part('month', o_orderdate) AS m,
      |  CAST(o_orderdate AS DATE) + 30 AS od_plus30,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
      |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_add(to_date(col("o_orderdate")), 30).as("od_plus30"),
        datediff(lit("1998-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_98"))
  }

  /** §2.9 sentiment — pure built-in (codegen'd) form. */
  val qSentimentBuiltin: QueryDef = QueryDef(
    "q26_sentiment_builtin",
    sentimentOracle) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        Sentiment.posCount(col("text")).as("pos_hits"),
        Sentiment.negCount(col("text")).as("neg_hits"),
        Sentiment.scoreBuiltin(col("text")).as("score"),
        Sentiment.label(Sentiment.scoreBuiltin(col("text"))).as("label"))
  }

  /** Same semantics through a Scala UDF (the reference's actual shape,
    * news_article_sentiment.py:94-112) — same oracle, so the two forms
    * are hash-compared against each other transitively. */
  val qSentimentUdf: QueryDef = QueryDef(
    "q27_sentiment_udf",
    sentimentOracle) { (s, dir) =>
    val scored = Tables.load(s, dir, "documents")
      .withColumn("score", Sentiment.scoreUdf(col("text")))
    scored.select(col("doc_id"),
      Sentiment.posCount(col("text")).as("pos_hits"),
      Sentiment.negCount(col("text")).as("neg_hits"),
      col("score"),
      Sentiment.label(col("score")).as("label"))
  }

  private lazy val sentimentOracle: String = {
    val pos = Sentiment.positive.map(w => s"'$w'").mkString(", ")
    val neg = Sentiment.negative.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |        x -> list_contains([$pos], x))) AS pos_hits,
       |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |        x -> list_contains([$neg], x))) AS neg_hits
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, pos_hits, neg_hits,
       |    CASE WHEN pos_hits + neg_hits = 0 THEN 0.0
       |         ELSE round((pos_hits - neg_hits) * 1.0 / (pos_hits + neg_hits), 4)
       |    END AS score
       |  FROM t)
       |SELECT doc_id, pos_hits, neg_hits, score,
       |  CASE WHEN score > 0.1 THEN 'positive'
       |       WHEN score < -0.1 THEN 'negative'
       |       ELSE 'neutral' END AS label
       |FROM sc""".stripMargin
  }

  /** Generator: explode tokens, global token frequencies (the
    * explode_outer fact-builder shape, 004_fact_...py:116). */
  val qExplodeTokens: QueryDef = QueryDef(
    "q28_explode_tokens",
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      |  FROM documents)
      |WHERE token <> '' GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      // outer + the existing non-empty filter: the inferred generate
      // predicate would re-evaluate the split per row (Dedup class doc)
      .select(explode_outer(split(lower(col("text")), "[^a-z]+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
  }

  /** Custom Catalyst Expression (codegen'd rolling hash). The oracle
    * replays the mod-2^64 polynomial in DuckDB via HUGEINT list_reduce
    * over ord() of the normalized chars (== UTF-8 bytes for this ASCII
    * corpus), then maps the unsigned result back to the signed long the
    * expression emits. UDF-reference parity is asserted in ScaleSpec. */
  val qRollingFingerprint: QueryDef = QueryDef(
    "q51_rolling_fingerprint",
    """WITH n AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CASE WHEN t = '' THEN CAST(0 AS HUGEINT)
      |    ELSE list_reduce(
      |      list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(string_split(t, ''), c -> CAST(ord(c) AS HUGEINT))),
      |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT))
      |    END AS uh
      |  FROM n)
      |SELECT doc_id,
      |  CAST(CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
      |       THEN uh - CAST('18446744073709551616' AS HUGEINT)
      |       ELSE uh END AS BIGINT) AS fp64
      |FROM h""".stripMargin) { (s, dir) =>
    import graft.functions.RollingHash
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        RollingHash.fingerprint64(col("text")).as("fp64"))
  }

  /** JSON-in-string column parse on real data (the events.props
    * envelope — same from_json shape as the DQ result envelopes). */
  val qPropsJson: QueryDef = QueryDef(
    "q74_props_json",
    """SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("STRUCT<k: INT>"))
          .getField("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  /** VARIANT semi-structured path (Spark 4): heterogeneous JSON parsed
    * ONCE into the binary variant encoding, fields extracted by path
    * with `variant_get` — the scale answer when payload shapes differ
    * per row (a single `from_json` schema can't cover them and
    * re-parsing per field re-reads the string). Payload built from
    * integer fields so both engines render identical JSON. */
  val qVariant: QueryDef = QueryDef(
    "q103_variant",
    """WITH p AS (
      |  SELECT CASE WHEN event_type = 'click'
      |    THEN '{"kind":"click","pos":{"x":' || CAST(user_id % 100 AS VARCHAR)
      |      || ',"y":' || CAST(event_id % 50 AS VARCHAR) || '}}'
      |    ELSE '{"kind":"' || event_type || '","vals":['
      |      || CAST(event_id % 7 AS VARCHAR) || ','
      |      || CAST(user_id % 13 AS VARCHAR) || ']}'
      |  END AS payload FROM events)
      |SELECT json_extract_string(payload, '$.kind') AS kind,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(coalesce(CAST(json_extract(payload, '$.pos.x') AS BIGINT),
      |                    CAST(json_extract(payload, '$.vals[0]') AS BIGINT))) AS BIGINT) AS sum_first,
      |  CAST(sum(coalesce(CAST(json_extract(payload, '$.pos.y') AS BIGINT),
      |                    CAST(json_extract(payload, '$.vals[1]') AS BIGINT))) AS BIGINT) AS sum_second
      |FROM p GROUP BY 1""".stripMargin) { (s, dir) =>
    val payload = when(col("event_type") === "click",
      concat(lit("""{"kind":"click","pos":{"x":"""),
        (col("user_id") % 100).cast("string"),
        lit(""","y":"""), (col("event_id") % 50).cast("string"), lit("}}")))
      .otherwise(concat(lit("""{"kind":""""), col("event_type"),
        lit("""","vals":["""), (col("event_id") % 7).cast("string"),
        lit(","), (col("user_id") % 13).cast("string"), lit("]}")))
    Tables.load(s, dir, "events")
      .withColumn("v", parse_json(payload))
      .groupBy(variant_get(col("v"), "$.kind", "string").as("kind"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(variant_get(col("v"), "$.pos.x", "bigint"),
          variant_get(col("v"), "$.vals[0]", "bigint"))).as("sum_first"),
        sum(coalesce(variant_get(col("v"), "$.pos.y", "bigint"),
          variant_get(col("v"), "$.vals[1]", "bigint"))).as("sum_second"))
  }

  /** ANSI-safe `try_*` family: Spark 4 runs ANSI mode, so bad casts /
    * overflow THROW by default — try_divide/try_cast/try_add are the
    * null-on-failure escape hatches a dirty-data pipeline needs.
    * Divisors are powers of two (exact IEEE scaling → no rounding
    * lattice risk); overflow rows add Long.MaxValue to a positive key. */
  val qTryFuncs: QueryDef = QueryDef(
    "q112_try_funcs",
    """SELECT o_orderkey,
      |  CASE WHEN o_custkey % 7 = 0 THEN NULL
      |       ELSE o_totalprice / (2 ** (o_custkey % 3)) END AS safe_div,
      |  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'x' || o_orderkey
      |                ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed,
      |  CASE WHEN o_orderkey % 7 = 3 THEN NULL
      |       ELSE o_orderkey + 1 END AS bumped
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        try_divide(col("o_totalprice"),
          when(col("o_custkey") % 7 === 0, lit(0.0))
            .otherwise(pow(lit(2), col("o_custkey") % 3))).as("safe_div"),
        when(col("o_orderkey") % 3 === 0,
          concat(lit("x"), col("o_orderkey").cast("string")))
          .otherwise(col("o_orderkey").cast("string"))
          .try_cast("bigint").as("parsed"),
        try_add(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 3, lit(Long.MaxValue))
            .otherwise(lit(1L))).as("bumped"))
  }

  /** Third sentiment form: native codegen expression (fused byte-walk,
    * no HOF arrays, no UDF serialization) — same oracle as q26/q27. */
  val qSentimentNative: QueryDef = QueryDef(
    "q75_sentiment_native",
    sentimentOracle) { (s, dir) =>
    import graft.functions.SentimentScore
    val scored = Tables.load(s, dir, "documents")
      .withColumn("score", SentimentScore.scoreCol(col("text")))
    scored.select(col("doc_id"),
      Sentiment.posCount(col("text")).as("pos_hits"),
      Sentiment.negCount(col("text")).as("neg_hits"),
      col("score"),
      Sentiment.label(col("score")).as("label"))
  }

  val all: Seq[QueryDef] = Seq(qStringFuncs, qDateFuncs, qSentimentBuiltin,
    qSentimentUdf, qExplodeTokens, qRollingFingerprint, qPropsJson,
    qSentimentNative, qVariant, qTryFuncs)
}
