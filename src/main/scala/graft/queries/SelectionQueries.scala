package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.scale.{Clusters, Decontaminate, Dedup, Retrieval, Selection,
  Similarity, Spans, TextStats}
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
       |    round(sum(lr.lr), 6) + 0.0 AS logw_sum,
       |    round(avg(lr.lr), 6) + 0.0 AS logw_mean
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

  /** Hybrid retrieval: three (text-terms, query-vector) queries — BM25
    * top-20 per query fused with dense cosine top-20 per query by
    * reciprocal-rank fusion (k0=60), top-10 fused results each. The
    * oracle replays BOTH rankers bit-exactly (the q141 fixed-order
    * pivot chain per query, the q44 cosine) and the fusion arithmetic
    * (1/(k0+rank) sums need no rounding — single IEEE ops). */
  val qHybridRrf: QueryDef = QueryDef(
    "q172_hybrid_rrf", {
      val specs = Seq(
        0L -> Seq("join", "vector", "scan"),
        1L -> Seq("stream", "window", "merge"),
        2L -> Seq("filter", "sort", "hash"))
      val allTerms = specs.flatMap(_._2).distinct
      val termList = allTerms.map(t => s"'$t'").mkString(", ")
      val perQuery = specs.map { case (qid, terms) =>
        val inList = terms.map(t => s"'$t'").mkString(", ")
        val chain = terms.map(t =>
          s"coalesce(max(CASE WHEN tok = '$t' THEN score END), 0.0)")
          .mkString(" +\n         |      ")
        s"""  SELECT CAST($qid AS BIGINT) AS query_id, doc_id,
           |    round($chain, 6) AS score
           |  FROM sc WHERE tok IN ($inList) GROUP BY doc_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |    x -> x <> '') AS toks
         |  FROM documents),
         |d AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
         |s AS (SELECT count(*) AS n,
         |        CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d),
         |tf AS (
         |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
         |  WHERE tok IN ($termList) GROUP BY 1, 2, 3),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id, tf.tok,
         |    round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
         |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
         |  FROM tf JOIN dfq ON tf.tok = dfq.tok CROSS JOIN s),
         |lex AS (
         |$perQuery),
         |lexk AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS INT) AS lrank
         |  FROM lex QUALIFY lrank <= 20),
         |qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings WHERE vec_id < 3),
         |cv AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings),
         |denk AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, doc_id ASC) AS INT) AS vrank
         |  FROM (
         |    SELECT q.query_id, c.doc_id,
         |      round(list_cosine_similarity(q.v, c.v), 6) AS sim
         |    FROM cv c CROSS JOIN qv q WHERE c.doc_id <> q.query_id)
         |  QUALIFY vrank <= 20),
         |f AS (
         |  SELECT coalesce(l.query_id, r.query_id) AS query_id,
         |    coalesce(l.doc_id, r.doc_id) AS doc_id,
         |    l.lrank AS lex_rank, r.vrank AS vec_rank,
         |    coalesce(CAST(1 AS DOUBLE) / (60 + l.lrank), 0.0) +
         |    coalesce(CAST(1 AS DOUBLE) / (60 + r.vrank), 0.0) AS rrf_score
         |  FROM lexk l FULL OUTER JOIN denk r
         |    ON l.query_id = r.query_id AND l.doc_id = r.doc_id)
         |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
         |FROM f
         |QUALIFY rank <= 10""".stripMargin
    }) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val emb = Tables.load(s, dir, "embeddings")
    val specs = Seq(
      0L -> Seq("join", "vector", "scan"),
      1L -> Seq("stream", "window", "merge"),
      2L -> Seq("filter", "sort", "hash"))
    val lex = Retrieval.bm25Queries(docs, "doc_id", "text", specs, k = 20)
    val dense = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 20)
      .withColumnRenamed("neighbor_id", "doc_id")
    Retrieval.rrfFuse(
      lex.select("query_id", "doc_id", "rank"),
      dense.select("query_id", "doc_id", "rank"),
      "query_id", "doc_id", "rank", k0 = 60, k = 10)
  }

  /** Hashed-feature linear quality classifier scored at scan speed —
    * the oracle replays tokenization, the gram stream, the md5-60
    * bucket hash, the deterministic weight table ((b % 1001) − 500),
    * and the exact-long fold. */
  val qQualityClassifier: QueryDef = QueryDef(
    "q173_quality_classifier",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_concat(toks,
       |    list_transform(range(1, greatest(len(toks), 1)),
       |      i -> toks[i] || ' ' || toks[i + 1]))) AS g
       |  FROM t),
       |fb AS (
       |  SELECT doc_id,
       |    ${md5Fold60Sql("g || ':qc'")} % 1024 AS b
       |  FROM g),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum((b % 1001) - 500) AS BIGINT) AS w_sum
       |  FROM fb GROUP BY 1)
       |SELECT t.doc_id,
       |  coalesce(a.n_feats, 0) AS n_feats,
       |  coalesce(a.w_sum, 0) AS w_sum,
       |  CASE WHEN coalesce(a.n_feats, 0) = 0 THEN 0.0
       |       ELSE CAST(a.w_sum AS DOUBLE) / a.n_feats END AS w_mean,
       |  CAST(coalesce(a.w_sum, 0) > 0 AS INT) AS keep
       |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, dir) =>
    Selection.classifierScore(Tables.load(s, dir, "documents"),
      "doc_id", "text", buckets = 1024)
  }

  /** Leakage-safe split over near-dup clusters: the q84 cluster
    * labels hashed to train/val/test — every member of a cluster
    * shares its split, so near-duplicates can never straddle
    * train/test. Oracle = the q84 recursive-CTE components + the same
    * md5-60 label hash. */
  val qLeakageSplit: QueryDef = QueryDef(
    "q174_leakage_split",
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                  x -> x <> '')) AS toks
       |  FROM documents WHERE doc_id < 60),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
       |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4)
       |        >= 0.7),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
       |comp AS (SELECT node, min(lab) AS cid FROM reach GROUP BY node),
       |assigned AS (
       |  SELECT t.doc_id, coalesce(comp.cid, t.doc_id) AS cluster_id
       |  FROM t LEFT JOIN comp ON t.doc_id = comp.node),
       |h AS (
       |  SELECT doc_id, cluster_id,
       |    ${md5Fold60Sql("'split:' || CAST(cluster_id AS VARCHAR)")} % 100
       |      AS hb
       |  FROM assigned)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN hb < 80 THEN 'train'
       |       WHEN hb < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM h""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 60)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.7)
      .select("id_a", "id_b")
    val labeled = Clusters.dedupClusters(docs.select("doc_id"), pairs, "doc_id")
      .select("doc_id", "cluster_id")
    Selection.leakageSafeSplit(labeled, "cluster_id",
      trainPct = 80, valPct = 10)
  }

  /** The round-9 pipeline composed end to end (Curation.curateV3):
    * classifier filter → span excision within the kept corpus →
    * token-budget selection on surviving tokens scored by the
    * classifier mean → chunking of the selected clean text. The
    * oracle chains the q173, q170, q171, and q167 replay fragments
    * into one CTE pipeline — the whole composition is hash-checked,
    * not just its parts. */
  val qCurateV3: QueryDef = QueryDef(
    "q175_curation_v3",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_concat(toks,
       |    list_transform(range(1, greatest(len(toks), 1)),
       |      i -> toks[i] || ' ' || toks[i + 1]))) AS g
       |  FROM t),
       |fb AS (
       |  SELECT doc_id,
       |    ${md5Fold60Sql("g || ':qc'")} % 1024 AS b
       |  FROM g),
       |cagg AS (
       |  SELECT doc_id, count(*) AS n_feats,
       |    CAST(sum((b % 1001) - 500) AS BIGINT) AS w_sum
       |  FROM fb GROUP BY 1),
       |cls AS (
       |  SELECT doc_id, CAST(w_sum AS DOUBLE) / n_feats AS w_mean
       |  FROM cagg WHERE w_sum > 0),
       |kept AS (SELECT t.doc_id, t.toks FROM t JOIN cls USING (doc_id)),
       |s AS (
       |  SELECT doc_id, i * 4 AS start,
       |    array_to_string(toks[i * 4 + 1 : i * 4 + 8], ' ') AS span
       |  FROM kept, unnest(range(0, CASE WHEN len(toks) >= 8
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
       |  FROM rm GROUP BY 1),
       |ex AS (
       |  SELECT kept.doc_id,
       |    list_filter(list_transform(range(0, len(toks)),
       |      i -> CASE WHEN r.ps IS NOT NULL AND list_contains(r.ps, i)
       |           THEN NULL ELSE toks[i + 1] END),
       |      x -> x IS NOT NULL) AS ctoks
       |  FROM kept LEFT JOIN rml r USING (doc_id)),
       |sc AS (
       |  SELECT ex.doc_id, cls.w_mean,
       |    CAST(len(ctoks) AS BIGINT) AS nl, ctoks
       |  FROM ex JOIN cls USING (doc_id)),
       |bud AS (SELECT CAST(floor(0.5 * sum(nl)) AS BIGINT) AS budget
       |        FROM sc),
       |c AS (
       |  SELECT doc_id, ctoks,
       |    CAST(coalesce(sum(nl) OVER (
       |      ORDER BY w_mean DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cb
       |  FROM sc),
       |selc AS (
       |  SELECT doc_id, ctoks AS toks FROM c
       |  WHERE cb < (SELECT budget FROM bud)),
       |k AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) = 0 THEN 0
       |         WHEN len(toks) <= 32 THEN 1
       |         ELSE CAST(floor((len(toks) - 32 + 23) / 24.0) AS INT) + 1
       |    END AS n_chunks
       |  FROM selc),
       |e AS (
       |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM k)
       |SELECT doc_id, CAST(i AS INT) AS chunk_id,
       |  CAST(len(toks[i * 24 + 1 : i * 24 + 32]) AS INT) AS chunk_toks,
       |  array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
       |FROM e""".stripMargin) { (s, dir) =>
    graft.scale.Curation.curateV3(Tables.load(s, dir, "documents"),
      "doc_id", "text")
  }

  /** Sequence packing (q178): lay the corpus out in doc_id order and
    * cut 256-token training sequences; one row per (sequence, doc)
    * overlap. The oracle replays the layout with a single SQL cumsum
    * window — the ENGINE computes the identical prefix through the
    * decomposed per-bin form ([[graft.scale.Selection.packSequences]]),
    * so the hash compare proves the decomposition exact, same as
    * q171. */
  val qSequencePack: QueryDef = QueryDef(
    "q178_sequence_pack",
    """WITH m AS (
      |  SELECT doc_id, CAST(len(list_filter(
      |      string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))
      |    AS BIGINT) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n,
      |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS off
      |  FROM m WHERE n > 0),
      |e AS (
      |  SELECT doc_id, n, off,
      |    unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS s
      |  FROM c)
      |SELECT CAST(s AS BIGINT) AS seq_id, doc_id,
      |  CAST(greatest(0, s * 256 - off) AS BIGINT) AS doc_off,
      |  CAST(greatest(0, off - s * 256) AS BIGINT) AS seq_pos,
      |  CAST(least(n, (s + 1) * 256 - off)
      |     - greatest(0, s * 256 - off) AS BIGINT) AS seg_len
      |FROM e""".stripMargin) { (s, dir) =>
    Selection.packSequences(
      Tables.load(s, dir, "documents").select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 256L)
  }

  /** Packing manifest (q179): per-sequence fill stats over the q178
    * segments — every sequence except the tail must be exactly full,
    * which the is_full flag makes hash-checkable. */
  val qPackManifest: QueryDef = QueryDef(
    "q179_pack_manifest",
    """WITH m AS (
      |  SELECT doc_id, CAST(len(list_filter(
      |      string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))
      |    AS BIGINT) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n,
      |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS off
      |  FROM m WHERE n > 0),
      |e AS (
      |  SELECT doc_id, n, off,
      |    unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS s
      |  FROM c),
      |seg AS (
      |  SELECT s AS seq_id,
      |    least(n, (s + 1) * 256 - off)
      |      - greatest(0, s * 256 - off) AS seg_len
      |  FROM e)
      |SELECT CAST(seq_id AS BIGINT) AS seq_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(seg_len) AS BIGINT) AS n_tokens,
      |  CAST(sum(seg_len) = 256 AS INT) AS is_full
      |FROM seg GROUP BY 1""".stripMargin) { (s, dir) =>
    Selection.packSequences(
      Tables.load(s, dir, "documents").select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 256L)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("seg_len")).cast("long").as("n_tokens"),
        (sum(col("seg_len")) === 256L).cast("int").as("is_full"))
  }

  /** Training-mix assembly (q181): the composed post-curation chain —
    * per-lang counts → UNCAPPED temperature epochs (scarce langs
    * upsample past 1, en downsamples) → deterministic copy
    * materialization → md5-60 shuffle order → exact 256-token packing
    * with (doc_id, copy_id) tie-breaks. ONE oracle replays all four
    * stages (the q130/q175 composition pattern), so replication
    * factors, per-copy hashes, layout order, and cut arithmetic are
    * hash-checked end to end. */
  val qTrainingMix: QueryDef = QueryDef(
    "q181_training_mix",
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |r AS (
       |  SELECT lang,
       |    CAST(2.0 AS DOUBLE) * CAST(sum(n) OVER () AS DOUBLE)
       |      * pow(n, 0.5) / sum(pow(n, 0.5)) OVER () / n AS f
       |  FROM c),
       |h AS (
       |  SELECT doc_id, lang, text,
       |    CAST(len(list_filter(string_split_regex(lower(text),
       |      '[^a-z]+'), x -> x <> '')) AS BIGINT) AS ntok,
       |    ${md5Fold60Sql("'em:' || text")}
       |      / 1152921504606846976.0 AS frac
       |  FROM documents),
       |cp AS (
       |  SELECT doc_id, text, ntok,
       |    CAST(floor(f) +
       |      CASE WHEN frac < f - floor(f) THEN 1 ELSE 0 END
       |      AS INT) AS n_copies
       |  FROM h JOIN r USING (lang)),
       |e AS (
       |  SELECT doc_id, text, ntok,
       |    unnest(range(0, n_copies)) AS copy_id
       |  FROM cp WHERE n_copies > 0),
       |m AS (
       |  SELECT doc_id, CAST(copy_id AS INT) AS copy_id, ntok AS n,
       |    ${md5Fold60Sql(
              "'emh:' || CAST(copy_id AS VARCHAR) || ':' || text")}
       |      AS mix_hash
       |  FROM e),
       |o AS (
       |  SELECT mix_hash, doc_id, copy_id, n,
       |    CAST(coalesce(sum(n) OVER (
       |      ORDER BY mix_hash ASC, doc_id ASC, copy_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS off
       |  FROM m WHERE n > 0),
       |sg AS (
       |  SELECT mix_hash, doc_id, copy_id, n, off,
       |    unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS s
       |  FROM o)
       |SELECT CAST(s AS BIGINT) AS seq_id, mix_hash, doc_id, copy_id,
       |  CAST(greatest(0, s * 256 - off) AS BIGINT) AS doc_off,
       |  CAST(greatest(0, off - s * 256) AS BIGINT) AS seq_pos,
       |  CAST(least(n, (s + 1) * 256 - off)
       |     - greatest(0, s * 256 - off) AS BIGINT) AS seg_len
       |FROM sg""".stripMargin) { (s, dir) =>
    graft.scale.Curation.trainingMix(
      Tables.load(s, dir, "documents"),
      "doc_id", "lang", "text", tau = 0.5, budgetEpochs = 2.0,
      seqLen = 256L)
  }

  /** The q171 continuous quality blend as a reusable oracle fragment:
    * CTEs `t` (tokens + punctuation counts, with `lang` carried) and
    * `m` (exact integer micro-unit score + token count) over
    * `documents` — see q171's scaladoc for why the arithmetic is
    * integer-exact until one final division. */
  private val qualityBlendSql: String =
    """t AS (
      |  SELECT lang, doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |      x -> x <> '') AS toks,
      |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS npunct,
      |    length(text) AS nchars
      |  FROM documents),
      |m AS (
      |  SELECT lang, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    (CAST(round(round(len(list_filter(toks, x -> list_contains(
      |          ['the','a','an','and','or','of','to','in','is','was'], x)))
      |        * 1.0 / greatest(len(toks), 1), 6) * 1000000) AS BIGINT) * 50
      |     + CAST(round(least(round(coalesce(
      |          list_sum(list_transform(toks, x -> length(x))), 0)
      |        * 1.0 / greatest(len(toks), 1), 6), 10.0) * 1000000)
      |        AS BIGINT) * 5
      |     - CAST(round(round(npunct * 1.0 / greatest(nchars, 1), 6)
      |        * 1000000) AS BIGINT) * 50) / 100000000.0 AS score
      |  FROM t)""".stripMargin

  /** The q171 blend as engine columns (same exact-integer-micro-unit
    * contract; see q171). */
  private def qualityBlend: org.apache.spark.sql.Column = {
    val micro =
      round(TextStats.stopwordRatio(col("text")) * 1000000).cast("long") * 50 +
      round(least(TextStats.meanTokenLen(col("text")), lit(10.0)) * 1000000)
        .cast("long") * 5 -
      round(TextStats.punctRatio(col("text")) * 1000000).cast("long") * 50
    micro.cast("double") / 100000000.0
  }

  /** Curriculum ordering: exact global difficulty rank (the q171
    * blend, ascending = easiest first), four equal-size stages, and a
    * seeded deterministic shuffle within each stage. The oracle
    * computes the rank with the NAIVE global row_number the engine's
    * bin decomposition must equal, then replays the stage arithmetic
    * and the md5-60 in-stage order. */
  val qCurriculum: QueryDef = QueryDef(
    "q183_curriculum",
    s"""WITH $qualityBlendSql,
       |r AS (
       |  SELECT doc_id, score,
       |    CAST(row_number() OVER (ORDER BY score ASC, doc_id ASC) - 1
       |      AS BIGINT) AS rank
       |  FROM m),
       |s AS (
       |  SELECT doc_id, score, rank,
       |    CAST(floor(rank * 4.0 / (SELECT count(*) FROM m)) AS INT)
       |      AS stage
       |  FROM r)
       |SELECT doc_id, score, rank, stage,
       |  CAST(row_number() OVER (PARTITION BY stage
       |    ORDER BY ${md5Fold60Sql("'cur:' || CAST(doc_id AS VARCHAR)")}
       |      ASC, doc_id ASC) AS INT) AS ord
       |FROM s""".stripMargin) { (s, dir) =>
    val scored = Tables.load(s, dir, "documents")
      .select(col("doc_id"), qualityBlend.as("score"))
    Selection.curriculumOrder(scored, "doc_id", "score", stages = 4)
  }

  /** Per-language token budgets — "the best 50% of tokens of EACH
    * language" (budget balancing a single global prefix cannot
    * express). The oracle is the naive per-group cumsum window the
    * engine's (group, bin)-decomposed windows must equal exactly. */
  val qLangBudget: QueryDef = QueryDef(
    "q184_lang_budget",
    s"""WITH $qualityBlendSql,
       |c AS (
       |  SELECT lang, doc_id, score, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY score DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before,
       |    CAST(floor(0.5 * sum(n_tokens) OVER (PARTITION BY lang))
       |      AS BIGINT) AS budget
       |  FROM m)
       |SELECT lang, doc_id, score, n_tokens, cum_before,
       |  CAST(cum_before < budget AS INT) AS selected
       |FROM c""".stripMargin) { (s, dir) =>
    val scored = Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"), qualityBlend.as("score"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    Selection.budgetSelectBy(scored, "lang", "doc_id", "score",
      "n_tokens", budgetFraction = 0.5)
  }

  /** Duplicate-aware epoch mixing: near-dup clusters (the q174 CC
    * slice) are replicated so the CLUSTER is seen ~3 epochs — each
    * member at 3/cluster_size (singletons triplicate; a 6-member
    * cluster's docs each carry f=0.5 and survive by content-hash
    * draw). The oracle replays the q174 components, the cluster
    * sizes, and the q180/q181 copy+mix_hash arithmetic. */
  val qClusterMix: QueryDef = QueryDef(
    "q185_cluster_mix",
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, text,
       |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                  x -> x <> '')) AS toks
       |  FROM documents WHERE doc_id < 60),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
       |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4)
       |        >= 0.7),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
       |comp AS (SELECT node, min(lab) AS cid FROM reach GROUP BY node),
       |assigned AS (
       |  SELECT t.doc_id, t.text, coalesce(comp.cid, t.doc_id) AS cluster_id
       |  FROM t LEFT JOIN comp ON t.doc_id = comp.node),
       |sz AS (
       |  SELECT a.doc_id, a.text, a.cluster_id,
       |    CAST(count(*) OVER (PARTITION BY a.cluster_id) AS BIGINT)
       |      AS cluster_size
       |  FROM assigned a),
       |h AS (
       |  SELECT doc_id, text, cluster_id, cluster_size,
       |    3.0 / cluster_size AS f,
       |    ${md5Fold60Sql("'em:' || text")}
       |      / 1152921504606846976.0 AS frac
       |  FROM sz),
       |cp AS (
       |  SELECT doc_id, text, cluster_id, cluster_size,
       |    CAST(floor(f) +
       |      CASE WHEN frac < f - floor(f) THEN 1 ELSE 0 END
       |      AS INT) AS n_copies
       |  FROM h),
       |e AS (
       |  SELECT doc_id, text, cluster_id, cluster_size,
       |    unnest(range(0, n_copies)) AS copy_id
       |  FROM cp WHERE n_copies > 0)
       |SELECT doc_id, cluster_id, cluster_size,
       |  CAST(copy_id AS INT) AS copy_id,
       |  ${md5Fold60Sql(
            "'emh:' || CAST(copy_id AS VARCHAR) || ':' || text")}
       |    AS mix_hash
       |FROM e""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.7)
      .select("id_a", "id_b")
    val labeled = Clusters.dedupClusters(docs, pairs, "doc_id")
    graft.scale.Sampling.epochMixWeighted(
        labeled.withColumn("__f", lit(3.0) / col("cluster_size")),
        "__f", "text")
      .select(col("doc_id"), col("cluster_id"),
        col("cluster_size").cast("long").as("cluster_size"),
        col("copy_id"), col("mix_hash"))
  }

  /** Sequence-length bucketing / padding waste (q193): power-of-two
    * length buckets with the padded-batching cost — the report that
    * decides exact packing (q178) vs plain bucketed padding. The
    * bucket is integer bit-length arithmetic (length(bin(n))−1), no
    * FP log2 whose power-of-two boundaries engines could round apart;
    * everything but the final waste division is exact longs. */
  val qLengthBuckets: QueryDef = QueryDef(
    "q193_length_buckets",
    """WITH t AS (
      |  SELECT CAST(len(list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))
      |    AS BIGINT) AS n
      |  FROM documents),
      |f AS (SELECT n, CASE WHEN n <= 0 THEN -1
      |               ELSE CAST(length(bin(n)) - 1 AS INT) END AS bucket
      |      FROM t),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(n) AS BIGINT) AS tok_sum
      |      FROM f GROUP BY 1),
      |c AS (SELECT *, CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT)
      |        ELSE (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END AS cap
      |      FROM g)
      |SELECT bucket, cap, n_docs, tok_sum,
      |  CAST(n_docs * cap AS BIGINT) AS padded_tokens,
      |  CASE WHEN bucket < 0 THEN 0.0
      |       ELSE round(1.0 - CAST(tok_sum AS DOUBLE) /
      |                  CAST(n_docs * cap AS DOUBLE), 6) END AS waste
      |FROM c""".stripMargin) { (s, dir) =>
    Selection.lengthBuckets(Tables.load(s, dir, "documents"), "text")
  }

  val all: Seq[QueryDef] =
    Seq(qSpanDedup, qChunk, qEmbedDecontaminate, qDsir, qSpanExcise,
      qBudgetSelect, qHybridRrf, qQualityClassifier, qLeakageSplit,
      qCurateV3, qSequencePack, qPackManifest, qTrainingMix,
      qCurriculum, qLangBudget, qClusterMix, qLengthBuckets)
}
