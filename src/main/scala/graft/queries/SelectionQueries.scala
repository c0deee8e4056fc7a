package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.scale.{Decontaminate, Selection, Spans, TextStats}
import org.apache.spark.sql.functions._

/** Round-9 training-data additions beyond the reference surface:
  * span-level repeated-content detection, token-window chunking,
  * embedding-space decontamination, and DSIR importance weighting.
  * All four are oracle-checked — DuckDB replays tokenization, span
  * arithmetic, cosine, and the md5-60 feature hash. */
object SelectionQueries {

  /** The q111 md5-60 fold over an arbitrary SQL string expression —
    * DuckDB replay of [[graft.scale.Dedup.md5Hash60]]. */
  private def md5Fold60Sql(input: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(substring(md5($input), 1, 15), ''),
       |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
       |    (a, d) -> a * 16 + d)""".stripMargin

  /** Cross-document repeated-span report (hash-gram approximation of
    * suffix-array substring dedup): 8-token windows at stride 4; a
    * span is duplicated iff its token content occurs in ≥ 2 distinct
    * documents. The oracle carries span STRINGS where the engine
    * carries xxhash64 longs — counts agree unless xxhash64 collides
    * (never observed; same convention as q110/q127). */
  val qSpanDedup: QueryDef = QueryDef(
    "q166_span_dedup",
    """WITH t AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(0, CAST(floor((len(toks) - 8) / 4.0) AS INT) + 1),
      |    i -> array_to_string(toks[i * 4 + 1 : i * 4 + 8], ' '))) AS span
      |  FROM t WHERE len(toks) >= 8),
      |d AS (
      |  SELECT doc_id, span,
      |    min(doc_id) OVER (PARTITION BY span)
      |      <> max(doc_id) OVER (PARTITION BY span) AS dup
      |  FROM s),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_spans,
      |    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
      |  FROM d GROUP BY 1)
      |SELECT t.doc_id,
      |  coalesce(a.n_spans, 0) AS n_spans,
      |  coalesce(a.dup_spans, 0) AS dup_spans,
      |  round(coalesce(a.dup_spans, 0) * 1.0 /
      |        greatest(coalesce(a.n_spans, 0), 1), 6) AS dup_ratio,
      |  CAST(round(coalesce(a.dup_spans, 0) * 1.0 /
      |        greatest(coalesce(a.n_spans, 0), 1), 6) >= 0.5 AS INT)
      |    AS flagged
      |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, dir) =>
    Spans.repeatedSpans(Tables.load(s, dir, "documents"),
      "doc_id", "text", n = 8, stride = 4, flagRatio = 0.5)
  }

  /** Token-window chunking: 32-token chunks, 8-token overlap, minimal
    * covering count — chunk text and arithmetic fully SQL-replayed. */
  val qChunk: QueryDef = QueryDef(
    "q167_doc_chunks",
    """WITH t AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN len(toks) = 0 THEN 0
      |         WHEN len(toks) <= 32 THEN 1
      |         ELSE CAST(floor((len(toks) - 32 + 23) / 24.0) AS INT) + 1
      |    END AS n_chunks
      |  FROM t),
      |e AS (
      |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM k)
      |SELECT doc_id, CAST(i AS INT) AS chunk_id,
      |  CAST(len(toks[i * 24 + 1 : i * 24 + 32]) AS INT) AS chunk_toks,
      |  array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
      |FROM e""".stripMargin) { (s, dir) =>
    Spans.chunk(Tables.load(s, dir, "documents"),
      "doc_id", "text", chunkSize = 32, overlap = 8)
  }

  /** Embedding-space decontamination: every 50th vector plays the
    * benchmark set (broadcast); corpus vectors are flagged by max
    * cosine ≥ 0.9 against any benchmark vector. */
  val qEmbedDecontaminate: QueryDef = QueryDef(
    "q168_embed_decontaminate",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |bench AS (SELECT v FROM e WHERE vec_id % 50 = 0),
      |corpus AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
      |sims AS (
      |  SELECT c.vec_id,
      |    round(list_cosine_similarity(c.v, b.v), 6) AS sim
      |  FROM corpus c CROSS JOIN bench b)
      |SELECT vec_id, max(sim) AS max_sim,
      |  CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_close,
      |  CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) > 0 AS INT)
      |    AS contaminated
      |FROM sims GROUP BY 1""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Decontaminate.embeddingOverlap(
      emb.filter(col("vec_id") % 50 =!= 0),
      emb.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", minCosine = 0.9)
  }

  /** DSIR importance weights: target = English documents, raw pool =
    * the rest; 256 hashed unigram+bigram buckets (md5-60 fold mod 256,
    * the q111 hash), add-one smoothing, per-doc mean log-ratio. The
    * oracle replays featurization, the hash, both smoothed models, and
    * the selection verdict. */
  val qDsir: QueryDef = QueryDef(
    "q169_dsir_weights",
    s"""WITH t AS (
       |  SELECT doc_id, lang, list_filter(
       |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_concat(toks,
       |    list_transform(range(1, greatest(len(toks), 1)),
       |      i -> toks[i] || ' ' || toks[i + 1]))) AS g
       |  FROM t),
       |fb AS (
       |  SELECT doc_id, lang,
       |    ${md5Fold60Sql("g || ':dsir'")} % 256 AS b
       |  FROM g),
       |ct AS (SELECT b, count(*) AS c FROM fb WHERE lang = 'en' GROUP BY 1),
       |cr AS (SELECT b, count(*) AS c FROM fb WHERE lang <> 'en' GROUP BY 1),
       |tt AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM ct),
       |tr AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM cr),
       |lr AS (
       |  SELECT coalesce(ct.b, cr.b) AS b,
       |    ln((coalesce(ct.c, 0) + 1.0) / ((SELECT t FROM tt) + 256)) -
       |    ln((coalesce(cr.c, 0) + 1.0) / ((SELECT t FROM tr) + 256)) AS lr
       |  FROM ct FULL OUTER JOIN cr ON ct.b = cr.b),
       |agg AS (
       |  SELECT fb.doc_id, count(*) AS n_feats,
       |    round(sum(lr.lr), 6) AS logw_sum,
       |    round(avg(lr.lr), 6) AS logw_mean
       |  FROM fb JOIN lr ON fb.b = lr.b WHERE fb.lang <> 'en' GROUP BY 1)
       |SELECT t.doc_id, coalesce(a.n_feats, 0) AS n_feats,
       |  coalesce(a.logw_sum, 0.0) AS logw_sum,
       |  coalesce(a.logw_mean, 0.0) AS logw_mean,
       |  CAST(coalesce(a.logw_mean, 0.0) > 0 AS INT) AS selected
       |FROM t LEFT JOIN agg a USING (doc_id)
       |WHERE t.lang <> 'en'""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    Selection.dsirWeights(
      docs.filter(col("lang") =!= "en"),
      docs.filter(col("lang") === "en"),
      "doc_id", "text", buckets = 256)
  }

  /** Span EXCISION — q166's flag pass turned into the transform:
    * tokens covered by a span whose content first occurs in an
    * earlier document are cut, docs reassembled from survivors. The
    * oracle replays window starts, the loser verdict, position
    * coverage, and the token-level rebuild. */
  val qSpanExcise: QueryDef = QueryDef(
    "q170_span_excise",
    """WITH t AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, i * 4 AS start,
      |    array_to_string(toks[i * 4 + 1 : i * 4 + 8], ' ') AS span
      |  FROM t, unnest(range(0, CASE WHEN len(toks) >= 8
      |      THEN CAST(floor((len(toks) - 8) / 4.0) AS INT) + 1
      |      ELSE 0 END)) AS u(i)),
      |l AS (
      |  SELECT doc_id, start FROM (
      |    SELECT doc_id, start,
      |      min(doc_id) OVER (PARTITION BY span) AS windoc
      |    FROM s) WHERE doc_id <> windoc),
      |rm AS (
      |  SELECT DISTINCT doc_id, p
      |  FROM l, unnest(range(start, start + 8)) AS r(p)),
      |rml AS (
      |  SELECT doc_id, count(*) AS n_removed, list(p) AS ps
      |  FROM rm GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
      |  coalesce(array_to_string(
      |    list_filter(list_transform(range(0, len(toks)),
      |      i -> CASE WHEN r.ps IS NOT NULL AND list_contains(r.ps, i)
      |           THEN NULL ELSE toks[i + 1] END),
      |      x -> x IS NOT NULL), ' '), '') AS clean_text
      |FROM t LEFT JOIN rml r USING (doc_id)""".stripMargin) { (s, dir) =>
    Spans.exciseRepeatedSpans(Tables.load(s, dir, "documents"),
      "doc_id", "text", n = 8, stride = 4)
  }

  /** Token-budget selection: keep the best-scoring documents until
    * 50% of corpus tokens are spent. The score is a CONTINUOUS
    * quality blend (stopword ratio + capped mean token length −
    * punctuation ratio) so the bin decomposition has spread to work
    * with. The blend is assembled in EXACT integer micro-units (each
    * 6-dp ratio × 10^6 is an integer; weights ×50/×5/×50 keep it one)
    * and divided by 10^8 once — a final `round(x, 6)` would sit on
    * round-half ties (a 6-dp value × 0.5 ends in …5) where Spark's
    * BigDecimal HALF_UP and DuckDB's float rounding disagree by one
    * ulp. The oracle replays the arithmetic and checks the engine's
    * binned prefix against the naive exact global cumsum. */
  val qBudgetSelect: QueryDef = QueryDef(
    "q171_budget_select",
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |      x -> x <> '') AS toks,
      |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS npunct,
      |    length(text) AS nchars
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    (CAST(round(round(len(list_filter(toks, x -> list_contains(
      |          ['the','a','an','and','or','of','to','in','is','was'], x)))
      |        * 1.0 / greatest(len(toks), 1), 6) * 1000000) AS BIGINT) * 50
      |     + CAST(round(least(round(coalesce(
      |          list_sum(list_transform(toks, x -> length(x))), 0)
      |        * 1.0 / greatest(len(toks), 1), 6), 10.0) * 1000000)
      |        AS BIGINT) * 5
      |     - CAST(round(round(npunct * 1.0 / greatest(nchars, 1), 6)
      |        * 1000000) AS BIGINT) * 50) / 100000000.0 AS score
      |  FROM t),
      |b AS (SELECT CAST(floor(0.5 * sum(n_tokens)) AS BIGINT) AS budget
      |      FROM m),
      |c AS (
      |  SELECT doc_id, score, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (
      |      ORDER BY score DESC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before
      |  FROM m)
      |SELECT doc_id, score, n_tokens, cum_before,
      |  CAST(cum_before < (SELECT budget FROM b) AS INT) AS selected
      |FROM c""".stripMargin) { (s, dir) =>
    val micro = // exact integer micro-units — see the oracle note above
      round(TextStats.stopwordRatio(col("text")) * 1000000).cast("long") * 50 +
      round(least(TextStats.meanTokenLen(col("text")), lit(10.0)) * 1000000)
        .cast("long") * 5 -
      round(TextStats.punctRatio(col("text")) * 1000000).cast("long") * 50
    val scored = Tables.load(s, dir, "documents").select(col("doc_id"),
      (micro.cast("double") / 100000000.0).as("score"),
      size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    Selection.budgetSelect(scored, "doc_id", "score", "n_tokens",
      budgetFraction = 0.5)
  }

  val all: Seq[QueryDef] =
    Seq(qSpanDedup, qChunk, qEmbedDecontaminate, qDsir, qSpanExcise,
      qBudgetSelect)
}
