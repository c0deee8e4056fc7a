package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.scale.{Clusters, Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Corpus-curation queries beyond round 1 (BASELINE.json extensions):
  * PII redaction, duplicate-content scoring, and near-dup cluster
  * assignment (connected components over the pair graph). */
object CorpusQueries {

  /** PII redaction. The synthetic corpus has no PII, so both engines
    * append the SAME deterministic email+phone suffix derived from
    * doc_id, then redact — the oracle checks the masking itself. */
  val qPiiRedact: QueryDef = QueryDef(
    "q82_pii_redact",
    s"""WITH pii AS (
       |  SELECT doc_id,
       |    text || ' Contact user' || doc_id ||
       |    '@example.com or call +1 555-' ||
       |    lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || ' now.' AS t
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(
       |    regexp_replace(t, '${TextStats.EmailPattern}', '[EMAIL]', 'g'),
       |    '${TextStats.PhonePattern}', '[PHONE]', 'g') AS redacted,
       |  len(regexp_extract_all(t, '${TextStats.EmailPattern}')) AS n_emails,
       |  len(regexp_extract_all(t, '${TextStats.PhonePattern}')) AS n_phones
       |FROM pii""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("t", concat(
        col("text"), lit(" Contact user"), col("doc_id"),
        lit("@example.com or call +1 555-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
        lit(" now.")))
      .select(col("doc_id"),
        TextStats.redactPii(col("t")).as("redacted"),
        TextStats.countMatches(col("t"), TextStats.EmailPattern).as("n_emails"),
        TextStats.countMatches(col("t"), TextStats.PhonePattern).as("n_phones"))
  }

  /** Gopher-style duplicate-content metrics per document. */
  val qDocRepetition: QueryDef = QueryDef(
    "q83_doc_repetition",
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(len(toks), 1)),
      |      i -> toks[i] || ' ' || toks[i + 1]) AS bis
      |  FROM t),
      |tc AS (
      |  SELECT doc_id, tok, count(*) AS n
      |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
      |ts AS (
      |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
      |    count(*) AS n_distinct, max(n) AS top_n
      |  FROM tc GROUP BY 1)
      |SELECT t.doc_id,
      |  coalesce(ts.n_toks, 0) AS n_toks,
      |  coalesce(ts.n_distinct, 0) AS n_distinct,
      |  round(CASE WHEN coalesce(ts.n_toks, 0) = 0 THEN 0.0
      |        ELSE 1.0 - ts.n_distinct * 1.0 / ts.n_toks END, 6) AS dup_tok_ratio,
      |  round(CASE WHEN coalesce(ts.n_toks, 0) = 0 THEN 0.0
      |        ELSE ts.top_n * 1.0 / ts.n_toks END, 6) AS top_tok_share,
      |  round(CASE WHEN len(bi.bis) = 0 THEN 0.0
      |        ELSE 1.0 - len(list_distinct(bi.bis)) * 1.0 / len(bi.bis) END, 6)
      |    AS dup_bigram_ratio
      |FROM t JOIN bi ON t.doc_id = bi.doc_id
      |LEFT JOIN ts ON t.doc_id = ts.doc_id""".stripMargin) { (s, dir) =>
    TextStats.repetitionMetrics(
      Tables.load(s, dir, "documents"), "doc_id", "text")
  }

  /** Near-dup cluster assignment: exact-jaccard pairs (≥0.7, the q41
    * pair set) → connected components → every doc labeled with its
    * component's min id. Oracle walks the same graph with a recursive
    * CTE. */
  val qDedupClusters: QueryDef = QueryDef(
    "q84_dedup_clusters",
    """WITH RECURSIVE t AS (
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
      |  FROM t LEFT JOIN comp ON t.doc_id = comp.node)
      |SELECT doc_id, cluster_id,
      |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |FROM assigned""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 60)
    val sets = docs.select(col("doc_id"), Dedup.tokenSet(col("text")).as("toks"))
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", round(Dedup.jaccard(col("ta"), col("tb")), 4))
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b")
    Clusters.dedupClusters(docs.select("doc_id"), pairs, "doc_id")
      .select("doc_id", "cluster_id", "cluster_size")
  }

  val all: Seq[QueryDef] = Seq(qPiiRedact, qDocRepetition, qDedupClusters)
}
