package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.scale.{Dedup, Multimodal, Similarity, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline queries (BASELINE.json extensions): dedup,
  * similarity search, text analysis, multimodal plumbing — over the
  * documents/embeddings tables. */
object ScaleQueries {

  /** documents ∪ planted exact duplicates (doc_id+1_000_000, every 10th
    * doc) — so exact dedup has real work to do and the oracle can
    * reproduce the corpus. */
  private def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  private val oracleCorpus =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  val qDedupExact: QueryDef = QueryDef(
    "q40_dedup_exact",
    s"""WITH $oracleCorpus,
       |fp AS (SELECT doc_id,
       |         sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
       |       FROM corpus)
       |SELECT doc_id, fingerprint FROM fp
       |WHERE doc_id = (SELECT min(f2.doc_id) FROM fp f2
       |                WHERE f2.fingerprint = fp.fingerprint)""".stripMargin) { (s, dir) =>
    Dedup.exactDedup(corpusWithDups(s, dir), "doc_id", "text")
      .select("doc_id", "fingerprint")
  }

  /** Exact n-gram(1) set jaccard for a bounded pair set — the oracle
    * for the similarity math that MinHash approximates. */
  val qNgramJaccard: QueryDef = QueryDef(
    "q41_ngram_jaccard",
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                  x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id < 60)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.toks, b.toks)) * 1.0 /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4)
      |    AS jaccard
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4)
      |      >= 0.7""".stripMargin) { (s, dir) =>
    Dedup.jaccardPairs(
      Tables.load(s, dir, "documents").filter(col("doc_id") < 60),
      "doc_id", "text", minJaccard = 0.7)
  }

  /** MinHash+LSH near-dup pipeline in reproducible-hash mode — the
    * oracle replays the ENTIRE pipeline in SQL: md5-60 shingle hashes,
    * the same 64 inlined (a,b) permutation coefficients, md5 band
    * buckets, and the exact-jaccard verification. The LSH candidate
    * set (including its misses) is therefore gate-checked, not just
    * spec-sampled. */
  private val mhParams =
    Dedup.MinHashParams(k = 64, bands = 32, shingle = 2, reproducible = true)

  private def minhashOracleSql(p: Dedup.MinHashParams, minJaccard: Double,
      docLimit: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM documents WHERE doc_id < $docLimit),
       |${MinhashOracle.cteChain("t", p, minJaccard, Some(1000))}
       |SELECT id_a, id_b, jaccard FROM verified_min""".stripMargin

  val qMinhashLsh: QueryDef = QueryDef(
    "q42_minhash_lsh",
    minhashOracleSql(mhParams, minJaccard = 0.4, docLimit = 200)) { (s, dir) =>
    Dedup.nearDuplicates(
      Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
      "doc_id", "text", minJaccard = 0.4, mhParams, maxBucket = Some(1000))
  }

  /** SimHash near-dup pairs with the md5-derived 60-bit token hash —
    * fully oracle-checked: DuckDB recomputes every signature (hex→int
    * via list_reduce, per-bit votes) and brute-forces the hamming
    * pairs, so the chunk-banding recall bound is verified by the gate
    * itself, not just a spec. The xxhash64 fast path keeps its
    * brute-force-equivalence test in DedupSpec. */
  val qSimhash: QueryDef = QueryDef(
    "q43_simhash",
    """WITH t AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id < 200),
      |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      |h AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(substring(md5(tk), 1, 15), ''),
      |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
      |    (a, d) -> a * 16 + d) AS hv
      |  FROM tok),
      |votes AS (
      |  SELECT doc_id, j,
      |    sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM h, generate_series(0, 59) s(j) GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
      |         AS BIGINT) AS sh
      |  FROM votes GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  bit_count(xor(a.sh, b.sh)) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 8""".stripMargin) { (s, dir) =>
    Dedup.simhashPairs(
      Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
      "doc_id", "text", maxHamming = 8,
      hasher = Dedup.md5Hash60, nBits = 60)
  }

  val qAnnBrute: QueryDef = QueryDef(
    "q44_ann_cosine",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |      FROM embeddings),
      |sims AS (
      |  SELECT query_id, neighbor_id,
      |    round(list_cosine_similarity(qv, cv), 6) AS sim
      |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
      |  FROM sims)
      |SELECT query_id, neighbor_id, sim, rank FROM ranked
      |WHERE rank <= 10""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10)
  }

  /** LSH-bucketed ANN — the seeded Gaussian hyperplanes are
    * deterministic, so they are INLINED into the oracle as double
    * literals and DuckDB replays the whole bucket→candidate→top-k
    * pipeline (sign flips would need |dot| < 1e-15 — never observed). */
  /** SQL replay of [[Similarity.lshBucket]] over a `v DOUBLE[]` column:
    * one CASE per inlined hyperplane, OR-ed into the sign-bit bucket. */
  private def lshBucketSql(dim: Int, nPlanes: Int, seed: Long): String =
    Similarity.planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, CAST(${p.mkString("[", ", ", "]")} " +
        s"AS DOUBLE[])) >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  private def annLshOracleSql(dim: Int, nPlanes: Int, seed: Long,
      k: Int): String = {
    val bucketExpr = lshBucketSql(dim, nPlanes, seed)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
       |      WHERE vec_id < 5),
       |sims AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv, c.v), 6) AS sim
       |  FROM b c JOIN q ON c.bucket = q.bucket
       |  WHERE c.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, sim, rank FROM ranked
       |WHERE rank <= $k""".stripMargin
  }

  val qAnnLsh: QueryDef = QueryDef(
    "q45_ann_lsh",
    annLshOracleSql(dim = 64, nPlanes = 4, seed = 42L, k = 10)) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, dim = 64, nPlanes = 4)
  }

  /** IVF-bucketed ANN — centroids (first 16 vectors by id), cell
    * assignment (round-9 cosine ranking, so both engines make the same
    * cell decisions), probes and the final top-k are all replayed by
    * the oracle. */
  val qAnnIvf: QueryDef = QueryDef(
    "q57_ann_ivf",
    """WITH c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |           FROM embeddings),
      |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |      FROM embeddings WHERE vec_id < 5),
      |cent AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS ce
      |         FROM embeddings ORDER BY vec_id LIMIT 16),
      |assigned AS (
      |  SELECT neighbor_id, cv, cell FROM (
      |    SELECT c.neighbor_id, c.cv, cent.cell,
      |      row_number() OVER (PARTITION BY c.neighbor_id
      |        ORDER BY round(list_cosine_similarity(c.cv, cent.ce), 9) DESC,
      |                 cent.cell ASC) AS rn
      |    FROM c CROSS JOIN cent) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT q.query_id, q.qv, cent.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, cent.ce), 9) DESC,
      |                 cent.cell ASC) AS rn
      |    FROM q CROSS JOIN cent) WHERE rn <= 2),
      |sims AS (
      |  SELECT p.query_id, a.neighbor_id,
      |    round(list_cosine_similarity(p.qv, a.cv), 6) AS sim
      |  FROM assigned a JOIN probes p ON a.cell = p.cell
      |  WHERE a.neighbor_id <> p.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
      |  FROM sims)
      |SELECT query_id, neighbor_id, sim, rank FROM ranked
      |WHERE rank <= 10""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, nCells = 16, nProbe = 2)
  }

  /** q149/q150 shared oracle prefix: the full PQ replay — seed
    * codebook (first 16 vectors by id, row_number → code), per-
    * subspace encode (round-9 dot argmax, ties → lowest code), ADC
    * terms, and the fixed-order 8-term score chain — ending at
    * `ranked` (per-query order by approx score). Mirrors
    * [[Similarity.pqTopK]] addend for addend. */
  private def pqRankedSql(m: Int, sub: Int, ksub: Int): String = {
    val chain = (0 until m)
      .map(s => s"max(CASE WHEN s = $s THEN d END)").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |subs AS (SELECT CAST(t.s AS INT) AS s FROM range(0, $m) t(s)),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1
       |      AS code, v
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $ksub)),
       |cs AS (SELECT s.s, c.code,
       |         list_slice(c.v, s.s*$sub+1, s.s*$sub+$sub) AS cvec
       |       FROM seeds c CROSS JOIN subs s),
       |enc AS (
       |  SELECT vec_id, s, code, cvec FROM (
       |    SELECT e.vec_id, cs.s, cs.code, cs.cvec,
       |      row_number() OVER (PARTITION BY e.vec_id, cs.s
       |        ORDER BY round(list_dot_product(
       |          list_slice(e.v, cs.s*$sub+1, cs.s*$sub+$sub), cs.cvec), 9)
       |          DESC, cs.code ASC) AS rn
       |    FROM e CROSS JOIN cs) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |terms AS (
       |  SELECT q.query_id, enc.vec_id AS neighbor_id, enc.s,
       |    round(list_dot_product(
       |      list_slice(q.qv, enc.s*$sub+1, enc.s*$sub+$sub), enc.cvec), 9)
       |      AS d
       |  FROM enc CROSS JOIN q WHERE enc.vec_id <> q.query_id),
       |sc AS (
       |  SELECT query_id, neighbor_id, round($chain, 6) AS score
       |  FROM terms GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM sc)""".stripMargin
  }

  /** Product-quantization ANN — the compressed-index leg (64-dim
    * float64 → 8 code bytes, 64×); the oracle replays codebook,
    * encode, and the ADC fixed-order score chain end to end. */
  val qAnnPq: QueryDef = QueryDef(
    "q149_ann_pq",
    s"""${pqRankedSql(m = 8, sub = 8, ksub = 16)}
       |SELECT query_id, neighbor_id, score, rank FROM ranked
       |WHERE rank <= 10""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, dim = 64, m = 8, ksub = 16)
  }

  /** PQ recall contract (q142/q146's gate on the COMPRESSED index):
    * the ADC candidate list must retain the brute top-10 at mean
    * recall ≥ the floor, asserted in-plan — quantization loss became
    * a checked property. Oracle recomputes candidates, brute truth,
    * hits, and the exact-arithmetic mean. Floor 0.3 vs measured
    * 0.48/0.56/0.54 at sf0.1/0.01/0.001 (the q142/q146 margin).
    *
    * The candidate budget is a constant FRACTION of the corpus —
    * max(30, ceil(1.5% · N)) — not a constant count: a fixed top-30
    * shortlist against a growing corpus dilutes recall mechanically
    * (measured: the 0.30 floor tripped the in-plan gate at the 15.5k-
    * vector sf3 sweep with nCand=30), while a fixed fraction holds
    * the recall/scan-cost trade flat at every measured SF. At the
    * driver SFs (≤ 2000 vectors) the fraction floor reproduces the
    * historical nCand=30 exactly, so the sf0.01 gate is unchanged.
    * N is derived INSIDE the plan (one-row broadcast of the corpus
    * count — the oracle's scalar-subquery shape), so the query is a
    * single lazy plan: no extra count action per invocation. */
  val qAnnPqRecall: QueryDef = QueryDef(
    "q150_ann_pq_recall",
    s"""${pqRankedSql(m = 8, sub = 8, ksub = 16)},
       |cand AS (SELECT query_id, neighbor_id FROM ranked
       |         WHERE rank <= (SELECT greatest(30,
       |             CAST(ceil(count(*) * 0.015) AS INT)) FROM e)),
       |brute AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qv, c.v), 6) DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id)
       |  WHERE rank <= 10),
       |hits AS (
       |  SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM brute b JOIN cand c
       |    ON b.query_id = c.query_id AND b.neighbor_id = c.neighbor_id
       |  GROUP BY 1),
       |per AS (
       |  SELECT d.query_id, coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit
       |  FROM (SELECT DISTINCT query_id FROM brute) d
       |  LEFT JOIN hits h ON d.query_id = h.query_id),
       |tot AS (SELECT CAST(sum(n_hit) AS DOUBLE) / (count(*) * 10)
       |          AS mean_recall FROM per)
       |SELECT query_id, n_hit, CAST(n_hit AS DOUBLE) / 10 AS recall,
       |  mean_recall
       |FROM per CROSS JOIN tot""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.pqRecallFrac(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, dim = 64, m = 8, ksub = 16,
      nCandMin = 30, nCandFrac = 0.015, minMeanRecall = 0.3)
  }

  /** Embedding-cosine near-dup pairs — exact all-pairs over a BOUNDED
    * slice: the ground-truth form recall is measured against (q41's
    * role for MinHash); the corpus-scale path is q117's bucketed
    * pipeline. */
  val qDedupEmbedding: QueryDef = QueryDef(
    "q58_dedup_embedding",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |           FROM embeddings WHERE vec_id < 300)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.35""".stripMargin) { (s, dir) =>
    Dedup.embeddingNearDups(
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300),
      "vec_id", "embedding", minCosine = 0.35)
  }

  /** Bucketed embedding near-dup over the FULL corpus — the 100 TB
    * shape: banded sign-LSH shuffle + within-bucket exact verify, no
    * broadcast of either side (ScaleSpec asserts the plan).
    *
    * The synthetic embeddings are near-orthogonal (no pairs above 0.5
    * cosine), so the corpus is augmented with deterministically
    * perturbed copies (v → 0.95·v + 0.01, id + 100000) — planted
    * near-dups at ~0.99 cosine, the regime production dedup actually
    * runs in (≥0.9 threshold, where LSH prunes 2^planes× per band).
    * Planes AND perturbation are replayed by the oracle, so the full
    * pipeline INCLUDING candidate misses is hash-checked. */
  private def dedupEmbeddingLshOracleSql(dim: Int, nPlanes: Int,
      bands: Int, seed: Long, minCosine: Double): String = {
    val bandSelects = (0 until bands).map { bnd =>
      s"SELECT vec_id, v, $bnd AS band, " +
        s"${lshBucketSql(dim, nPlanes, seed + bnd)} AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |              FROM embeddings),
       |e AS (SELECT vec_id, v FROM base
       |      UNION ALL
       |      SELECT vec_id + 100000,
       |        list_transform(v, x -> x * 0.95 + 0.01) FROM base),
       |b AS ($bandSelects)
       |SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
       |  round(list_cosine_similarity(a.v, c.v), 6) AS cosine
       |FROM b a JOIN b c
       |  ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
       |WHERE round(list_cosine_similarity(a.v, c.v), 6) >= $minCosine""".stripMargin
  }

  val qDedupEmbeddingLsh: QueryDef = QueryDef(
    "q117_dedup_embedding_lsh",
    dedupEmbeddingLshOracleSql(dim = 64, nPlanes = 8, bands = 2,
      seed = 42L, minCosine = 0.9)) { (s, dir) =>
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val perturbed = base.select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * 0.95 + 0.01).as("embedding"))
    Dedup.embeddingNearDupsBucketed(
      base.unionByName(perturbed),
      "vec_id", "embedding", minCosine = 0.9, dim = 64, nPlanes = 8,
      bands = 2)
  }

  /** Incremental embedding dedup against the vector index — the
    * q132 pattern on vectors (Dedup.dedupVectorsAgainstIndex): the
    * corpus (vec_id % 5 ≤ 2) is indexed, the batch is perturbed
    * copies of corpus vectors (%5 = 0 → caught at ~0.999 cosine) and
    * of NON-corpus vectors (%5 = 4 → near-orthogonal to the whole
    * index → kept). Planes, perturbation, banding, and the cosine
    * verify are all replayed by the oracle (the q117 machinery). */
  val qVectorIndexDedup: QueryDef = QueryDef(
    "q136_vector_index_dedup", {
      val (dim, nPlanes, bands, seed) = (64, 8, 2, 42L)
      def bandSelects(rel: String) = (0 until bands).map { bnd =>
        s"SELECT vec_id, v, $bnd AS band, " +
          s"${lshBucketSql(dim, nPlanes, seed + bnd)} AS bucket FROM $rel"
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |              FROM embeddings),
         |c AS (SELECT vec_id, v FROM base WHERE vec_id % 5 <= 2),
         |bt AS (SELECT vec_id + 100000 AS vec_id,
         |         list_transform(v, x -> x * 0.95 + 0.01) AS v
         |       FROM base WHERE vec_id % 5 = 0 OR vec_id % 5 = 4),
         |cb AS (${bandSelects("c")}),
         |bb AS (${bandSelects("bt")}),
         |ag AS (
         |  SELECT b.vec_id AS bid, c2.vec_id AS cid,
         |    round(list_cosine_similarity(b.v, c2.v), 6) AS cos
         |  FROM bb b JOIN cb c2
         |    ON b.band = c2.band AND b.bucket = c2.bucket),
         |m AS (SELECT bid, min(cid) AS matched_id, max(cos) AS best_cosine
         |      FROM ag WHERE cos >= 0.9 GROUP BY bid)
         |SELECT bt.vec_id, m.matched_id,
         |  CASE WHEN m.matched_id IS NULL THEN 1 ELSE 0 END AS kept,
         |  m.best_cosine
         |FROM bt LEFT JOIN m ON bt.vec_id = m.bid""".stripMargin
    }) { (s, dir) =>
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = base.filter(col("vec_id") % 5 <= 2)
    val batch = base
      .filter(col("vec_id") % 5 === 0 || col("vec_id") % 5 === 4)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * 0.95 + 0.01).as("embedding"))
    Dedup.dedupVectorsAgainstIndex(batch, corpus, "vec_id", "embedding",
      minCosine = 0.9, dim = 64, nPlanes = 8, bands = 2)
  }

  /** ANN recall as a CHECKED contract (Similarity.lshRecall): per
    * query, recall@5 of the banded-LSH candidate set vs the exact
    * brute-force top-5 over the planted-near-dup corpus (the q117
    * augmentation), with the corpus-wide mean recall gated in-plan by
    * assert_true — the q133 exactness-gate pattern applied to ANN.
    * The oracle replays buckets, candidates, hits and the mean with
    * exact-long arithmetic, so the recall NUMBER (not just the rows)
    * is cross-engine-checked. The 0.15 floor sits ~30% under the
    * measured mean (0.21 at sf0.01): almost every 0.9996-cosine
    * planted copy lands in a shared bucket (8 planes × 2 bands — a
    * rare per-query miss is possible and the near-orthogonal noise
    * neighbors are intentionally hard), so the mean holds the floor
    * while a systematic banding regression trips the gate. */
  val qAnnRecall: QueryDef = QueryDef(
    "q142_ann_recall", {
      val (dim, nPlanes, bands, seed, k) = (64, 8, 2, 42L, 5)
      def bandSelects(rel: String) = (0 until bands).map { bnd =>
        s"SELECT vec_id, $bnd AS band, " +
          s"${lshBucketSql(dim, nPlanes, seed + bnd)} AS bucket FROM $rel"
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |              FROM embeddings),
         |e AS (SELECT vec_id, v FROM base
         |      UNION ALL
         |      SELECT vec_id + 100000,
         |        list_transform(v, x -> x * 0.95 + 0.01) FROM base),
         |q AS (SELECT vec_id, v FROM base WHERE vec_id < 50),
         |sims AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.v, e.v), 6) AS sim
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.vec_id),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM sims) WHERE rank <= $k),
         |qb AS (${bandSelects("q")}),
         |cb AS (${bandSelects("e")}),
         |cand AS (
         |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
         |  FROM qb JOIN cb ON qb.band = cb.band AND qb.bucket = cb.bucket
         |  WHERE cb.vec_id <> qb.vec_id),
         |hits AS (
         |  SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM brute b JOIN cand c
         |    ON b.query_id = c.query_id AND b.neighbor_id = c.neighbor_id
         |  GROUP BY 1),
         |perq AS (
         |  SELECT dq.query_id, coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit
         |  FROM (SELECT DISTINCT query_id FROM brute) dq
         |  LEFT JOIN hits h ON dq.query_id = h.query_id),
         |tot AS (SELECT CAST(sum(n_hit) AS DOUBLE) / (count(*) * $k)
         |          AS mean_recall FROM perq)
         |SELECT query_id, n_hit, n_hit / $k.0 AS recall, mean_recall
         |FROM perq CROSS JOIN tot""".stripMargin
    }) { (s, dir) =>
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val perturbed = base.select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * 0.95 + 0.01).as("embedding"))
    Similarity.lshRecall(base.unionByName(perturbed),
      base.filter(col("vec_id") < 50), "vec_id", "embedding",
      k = 5, dim = 64, nPlanes = 8, bands = 2, seed = 42L,
      minMeanRecall = 0.15)
  }

  /** q142's checked-recall contract for the IVF index: recall@10 of
    * the 2-of-16-cell probe candidate set vs the brute-force truth,
    * mean gated at 0.6 in-plan (measured 0.82/0.90/0.98 at
    * sf0.001/0.01/0.1 — centroid cells track cosine neighborhoods far
    * better than random sign-planes, which is why IVF is the
    * scale path when recall matters). The oracle replays cell
    * assignment (round-9 ranking, q57's machinery), probes,
    * candidates, and the exact-long mean. */
  val qIvfRecall: QueryDef = QueryDef(
    "q146_ivf_recall",
    """WITH c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |           FROM embeddings),
      |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |      FROM embeddings WHERE vec_id < 5),
      |cent AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS ce
      |         FROM embeddings ORDER BY vec_id LIMIT 16),
      |assigned AS (
      |  SELECT neighbor_id, cv, cell FROM (
      |    SELECT c.neighbor_id, c.cv, cent.cell,
      |      row_number() OVER (PARTITION BY c.neighbor_id
      |        ORDER BY round(list_cosine_similarity(c.cv, cent.ce), 9) DESC,
      |                 cent.cell ASC) AS rn
      |    FROM c CROSS JOIN cent) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT q.query_id, q.qv, cent.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, cent.ce), 9) DESC,
      |                 cent.cell ASC) AS rn
      |    FROM q CROSS JOIN cent) WHERE rn <= 2),
      |cand AS (
      |  SELECT p.query_id, a.neighbor_id
      |  FROM assigned a JOIN probes p ON a.cell = p.cell
      |  WHERE a.neighbor_id <> p.query_id),
      |sims AS (
      |  SELECT q.query_id, c.neighbor_id,
      |    round(list_cosine_similarity(q.qv, c.cv), 6) AS sim
      |  FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
      |brute AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY sim DESC, neighbor_id ASC) AS rank
      |    FROM sims) WHERE rank <= 10),
      |hits AS (
      |  SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hit
      |  FROM brute b JOIN cand c
      |    ON b.query_id = c.query_id AND b.neighbor_id = c.neighbor_id
      |  GROUP BY 1),
      |perq AS (
      |  SELECT dq.query_id, coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit
      |  FROM (SELECT DISTINCT query_id FROM brute) dq
      |  LEFT JOIN hits h ON dq.query_id = h.query_id),
      |tot AS (SELECT CAST(sum(n_hit) AS DOUBLE) / (count(*) * 10)
      |          AS mean_recall FROM perq)
      |SELECT query_id, n_hit, n_hit / 10.0 AS recall, mean_recall
      |FROM perq CROSS JOIN tot""".stripMargin) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.ivfRecall(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10, nCells = 16, nProbe = 2,
      minMeanRecall = 0.6)
  }

  val qTokenStats: QueryDef = QueryDef(
    "q46_token_stats",
    s"""SELECT doc_id,
       |  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '${TextStats.BpeishPattern}')) AS n_bpeish_tokens,
       |  length(text) AS n_chars
       |FROM documents""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        TextStats.tokenCountWs(col("text")).as("n_ws_tokens"),
        TextStats.tokenCountBpeish(col("text")).as("n_bpeish_tokens"),
        TextStats.charCount(col("text")).as("n_chars"))
  }

  val qQuality: QueryDef = QueryDef(
    "q47_quality_score",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nws,
       |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS npunct,
       |    length(text) AS nchars
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, nws,
       |    round(npunct * 1.0 / greatest(nchars, 1), 6) AS punct_ratio,
       |    round(len(list_filter(toks, x -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','was'], x))) * 1.0
       |      / greatest(len(toks), 1), 6) AS stop_ratio,
       |    round(list_sum(list_transform(toks, x -> length(x))) * 1.0
       |      / greatest(len(toks), 1), 6) AS mean_tok_len
       |  FROM t)
       |SELECT doc_id, punct_ratio, stop_ratio, mean_tok_len,
       |  round(CAST((CASE WHEN nws >= 20 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |        (CASE WHEN mean_tok_len BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |        (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |        (CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.3 AS DOUBLE), 2)
       |    AS quality
       |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        TextStats.punctRatio(col("text")).as("punct_ratio"),
        TextStats.stopwordRatio(col("text")).as("stop_ratio"),
        TextStats.meanTokenLen(col("text")).as("mean_tok_len"),
        TextStats.qualityScore(col("text")).as("quality"))
  }

  val qLangId: QueryDef = QueryDef(
    "q48_lang_id",
    """WITH t AS (
      |  SELECT doc_id, lang AS labeled_lang,
      |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, labeled_lang,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
      |    len(list_filter(toks, x -> list_contains(['the','a','and','is','of','to'], x))) AS s_en,
      |    len(list_filter(toks, x -> list_contains(['el','la','los','que','es','y'], x))) AS s_es,
      |    len(list_filter(toks, x -> list_contains(['le','la','les','et','est','que'], x))) AS s_fr
      |  FROM t)
      |SELECT doc_id, labeled_lang,
      |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
      |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
      |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
      |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
      |       ELSE 'fr' END AS predicted_lang
      |FROM sc""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TextStats.langId(col("text")).as("predicted_lang"))
  }

  val qFingerprint: QueryDef = QueryDef(
    "q49_fingerprint",
    """SELECT doc_id,
      |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |  length(text) AS n_chars
      |FROM documents""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        Dedup.fingerprint(col("text")).as("fingerprint"),
        length(col("text")).as("n_chars"))
  }

  /** Multimodal plumbing: text packed as binary media, partition-batched
    * stub decode; every output feature is a pure function of the byte
    * length + content so DuckDB can reproduce it (checksum = byte sum —
    * ASCII text, so it equals the sum of UTF-8 code units, not
    * expressible in DuckDB → derived via ord() over chars instead). */
  val qMultimodal: QueryDef = QueryDef(
    "q50_multimodal",
    """SELECT doc_id AS media_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  octet_length(CAST(text AS BLOB)) % 640 + 1 AS width,
      |  octet_length(CAST(text AS BLOB)) % 480 + 1 AS height,
      |  CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x)))
      |       AS BIGINT) AS checksum
      |FROM documents""".stripMargin) { (s, dir) =>
    Multimodal.decodeFeatures(
      Multimodal.packText(Tables.load(s, dir, "documents"), "doc_id", "text"))
  }

  /** TF-IDF top-3 terms per doc (bounded slice; ln parity holds to the
    * 6-decimal rounding). */
  val qTfidf: QueryDef = QueryDef(
    "q70_tfidf",
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS term
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    round(tf.tf * ln((SELECT n_docs FROM n) * 1.0 / dfreq.df), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (term)),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term ASC) AS rank
      |  FROM scored)
      |SELECT doc_id, term, tf, df, tfidf, rank FROM ranked
      |WHERE rank <= 3 AND doc_id < 100""".stripMargin) { (s, dir) =>
    TextStats.tfidfTopTerms(Tables.load(s, dir, "documents"),
      "doc_id", "text", topK = 3)
      .filter(col("doc_id") < 100)
  }

  /** approx_percentile sketch — the sketch estimate is engine-
    * specific, so the ORACLE checks a bounded-error contract: exact
    * interpolated quantiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, rounded to 4dp on both sides) hash-compare
    * directly, and `within_band` — true iff the sketch's median landed
    * inside the exact p25..p75 span — must hash-equal the oracle's
    * literal TRUE. A drifting sketch fails the oracle compare. */
  val qApproxPercentile: QueryDef = QueryDef(
    "q71_approx_percentile",
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  TRUE AS within_band
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("exact_median"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_median"),
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
        .withColumn("within_band",
          col("approx_median").between(col("p25"), col("p75")))
        .drop("approx_median")
    }

  /** Content-hash train/val/test split — reproducible across engines,
    * so the whole assignment is oracle-checked. */
  val qSplit: QueryDef = QueryDef(
    "q72_deterministic_split",
    """WITH h AS (
      |  SELECT doc_id,
      |    substr(sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 2) AS hx
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket
      |  FROM h)
      |SELECT doc_id,
      |  CASE WHEN bucket < 204 THEN 'train'
      |       WHEN bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM b""".stripMargin) { (s, dir) =>
    graft.scale.Sampling.deterministicSplit(
      Tables.load(s, dir, "documents"), "text")
      .select("doc_id", "split")
  }

  /** Stratified mixing-ratio sample, deterministic form: per-stratum
    * keep iff the salted md5-60 content fraction is below the
    * stratum's target rate — membership is a pure content function
    * both engines compute, so the FULL sample (not just counts) is
    * hash-gated. (The seeded `sampleBy` wrapper remains as
    * [[graft.scale.Sampling.stratifiedSample]] with its ScaleSpec
    * contract; this query was rows-only while it used it.) */
  val qStratified: QueryDef = QueryDef(
    "q73_stratified_sample",
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(substring(md5('ss:' || text), 1, 15), ''),
      |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
      |    (a, d) -> a * 16 + d) / 1152921504606846976.0 AS keep_frac
      |  FROM documents),
      |r AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 1.0), ('es', 0.1),
      |                            ('zh', 0.25), ('fr', 0.0)) v(lang, rate))
      |SELECT doc_id, lang, keep_frac
      |FROM t JOIN r USING (lang) WHERE keep_frac < rate""".stripMargin) {
    (s, dir) =>
      graft.scale.Sampling.stratifiedDeterministic(
        Tables.load(s, dir, "documents"), "lang", "text",
        Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.1, "zh" -> 0.25, "fr" -> 0.0))
        .select("doc_id", "lang", "keep_frac")
  }

  /** int8-quantized vs exact cosine over a bounded pair set — the
    * quantized dot products are integer-exact, so both engines agree
    * bit-for-bit on the approximation error. */
  val qVectorQuantize: QueryDef = QueryDef(
    "q87_vector_quantize",
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS mx
      |  FROM embeddings WHERE vec_id < 30),
      |q AS (
      |  SELECT vec_id, e,
      |    list_transform(e, x -> round(x * 127.0 / mx)) AS qe
      |  FROM v WHERE mx > 0)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.e, b.e), 6) AS exact_cos,
      |  round(list_cosine_similarity(a.qe, b.qe), 6) AS approx_cos,
      |  round(abs(round(list_cosine_similarity(a.e, b.e), 6) -
      |            round(list_cosine_similarity(a.qe, b.qe), 6)), 6) AS abs_err
      |FROM q a JOIN q b ON a.vec_id < b.vec_id""".stripMargin) { (s, dir) =>
    val v = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("mx", array_max(transform(col("e"), x => abs(x))))
      .filter(col("mx") > 0)
      .withColumn("qe", Similarity.quantizeInt8(col("e")))
    val a = v.select(col("vec_id").as("id_a"), col("e").as("ea"), col("qe").as("qa"))
    val b = v.select(col("vec_id").as("id_b"), col("e").as("eb"), col("qe").as("qb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("ea"), col("eb")), 6).as("exact_cos"),
        round(Similarity.cosine(col("qa"), col("qb")), 6).as("approx_cos"),
        round(abs(round(Similarity.cosine(col("ea"), col("eb")), 6) -
          round(Similarity.cosine(col("qa"), col("qb")), 6)), 6).as("abs_err"))
  }

  /** Random-projection embedding compression (q190): 64 → 16 dims
    * through a deterministic ±1 matrix (scale.Projection scaladoc) —
    * a pure scan-speed projection, zero exchanges. The oracle derives
    * the SAME sign matrix from md5-60 parity of "rp:i:j" (proving the
    * driver-side literal table), quantizes with the same floor(v·2²⁰),
    * and folds exact longs — bit-stable end to end. */
  val qRandomProjection: QueryDef = QueryDef(
    "q190_random_projection",
    """WITH grid AS (
      |  SELECT i.i, j.j,
      |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(
      |          substring(md5('rp:' || i.i || ':' || j.j), 1, 15), ''),
      |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
      |        (a, d) -> a * 16 + d) % 2 = 0
      |      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sgn
      |  FROM (SELECT unnest(range(0, 16)) AS i) i
      |  CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      v -> CAST(floor(v * 1048576) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (SELECT vec_id,
      |        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS onrm
      |      FROM q),
      |p AS (
      |  SELECT vec_id, g.i AS i,
      |    CAST(sum(g.sgn * qv[CAST(g.j AS INT)]) AS BIGINT) AS pl
      |  FROM q CROSS JOIN grid g GROUP BY 1, 2),
      |pn AS (SELECT vec_id, CAST(sum(pl * pl) AS BIGINT) AS pnrm
      |       FROM p GROUP BY 1)
      |SELECT p.vec_id, CAST(p.i AS INT) AS i,
      |  CAST(pl AS DOUBLE) / 1048576.0 / 4.0 AS value,
      |  CASE WHEN n.onrm = 0 THEN 0.0
      |       ELSE round(sqrt(CAST(pn.pnrm AS DOUBLE) / 16.0) /
      |                  sqrt(CAST(n.onrm AS DOUBLE)), 6) END AS dist_ratio
      |FROM p JOIN n USING (vec_id) JOIN pn USING (vec_id)""".stripMargin) {
    (s, dir) =>
      graft.scale.Projection.randomProject(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        dIn = 64, dOut = 16)
  }

  /** Frame sampling over binary media (video-frame / audio-chunk
    * shape): first 4 × 256-byte windows per blob with checksums; the
    * ASCII corpus makes the byte math reproducible via ord() in SQL. */
  val qFrameSample: QueryDef = QueryDef(
    "q91_frame_sample",
    """WITH f AS (
      |  SELECT doc_id AS media_id, i AS frame_no,
      |    substring(text, i * 256 + 1, 256) AS frame
      |  FROM documents, generate_series(0, 3) t(i)
      |  WHERE length(text) > i * 256)
      |SELECT media_id, CAST(frame_no AS INT) AS frame_no,
      |  length(frame) AS frame_bytes,
      |  CAST(list_sum(list_transform(string_split(frame, ''), c -> ord(c)))
      |       AS BIGINT) AS frame_checksum
      |FROM f""".stripMargin) { (s, dir) =>
    Multimodal.frameSample(
      Multimodal.packText(Tables.load(s, dir, "documents"), "doc_id", "text"),
      frameSize = 256, maxFrames = 4)
  }

  /** Unigram-LM mean surprisal per doc — the cheap language-model
    * quality signal (ln parity with DuckDB holds at 6 decimals). */
  val qSurprisal: QueryDef = QueryDef(
    "q93_lm_surprisal",
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS term
      |  FROM documents),
      |cnt AS (SELECT term, count(*) AS c FROM terms GROUP BY 1),
      |tot AS (SELECT count(*) AS t FROM terms)
      |SELECT terms.doc_id, count(*) AS n_toks,
      |  round(-avg(ln(cnt.c * 1.0 / (SELECT t FROM tot))), 6) AS mean_surprisal
      |FROM terms JOIN cnt USING (term)
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    TextStats.unigramSurprisal(
      Tables.load(s, dir, "documents"), "doc_id", "text")
  }

  /** Interpolated bigram surprisal (λ·bigram + (1−λ)·unigram backoff) —
    * the LM-quality upgrade over q93; adjacent-token pairs come from
    * zipping the token list with its own tail in BOTH engines, so the
    * full model (3 count tables + interpolation) is oracle-replayed. */
  val qBigramSurprisal: QueryDef = QueryDef(
    "q118_bigram_surprisal",
    """WITH lists AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS l
      |  FROM documents),
      |uni AS (SELECT unnest(l) AS term FROM lists),
      |cu AS (SELECT term, count(*) AS cu FROM uni GROUP BY 1),
      |tot AS (SELECT count(*) AS t FROM uni),
      |bi AS (
      |  SELECT doc_id, z[1] AS prev, z[2] AS cur
      |  FROM (SELECT doc_id, unnest(list_zip(l[:-2], l[2:])) AS z
      |        FROM lists WHERE len(l) >= 2)),
      |cb AS (SELECT prev, cur, count(*) AS cb FROM bi GROUP BY 1, 2),
      |cp AS (SELECT prev, count(*) AS cp FROM bi GROUP BY 1)
      |SELECT bi.doc_id, count(*) AS n_bigrams,
      |  round(-avg(ln(0.75 * (CAST(cb.cb AS DOUBLE) / cp.cp) +
      |                0.25 * (CAST(cu.cu AS DOUBLE) / (SELECT t FROM tot)))), 6)
      |    AS mean_surprisal
      |FROM bi JOIN cb USING (prev, cur) JOIN cp USING (prev)
      |  JOIN cu ON cu.term = bi.cur
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    TextStats.bigramSurprisal(
      Tables.load(s, dir, "documents"), "doc_id", "text", lambda = 0.75)
  }

  /** q118's LM scorer under a BINDING vocabulary cap (TextStats
    * vocabCap = 60 ≪ the corpus bigram vocabulary): the shipped model
    * is the top-60 bigram rows + top-60 unigram rows by count (ties by
    * key — a total order both engines sort identically), out-of-model
    * pairs back off to the unigram leg with a count floor of 1. The
    * oracle replays the cap selection AND the backoff, so the
    * bounded-broadcast contract — the thing that keeps the q118 plan
    * alive on a corpus whose vocabulary outgrows broadcast — is
    * gate-checked cross-engine, not just spec-asserted. */
  val qBigramSurprisalCapped: QueryDef = QueryDef(
    "q163_bigram_surprisal_capped",
    """WITH lists AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS l
      |  FROM documents),
      |uni AS (SELECT unnest(l) AS term FROM lists),
      |cu AS (SELECT term, count(*) AS cu FROM uni GROUP BY 1),
      |tot AS (SELECT count(*) AS t FROM uni),
      |bi AS (
      |  SELECT doc_id, z[1] AS prev, z[2] AS cur
      |  FROM (SELECT doc_id, unnest(list_zip(l[:-2], l[2:])) AS z
      |        FROM lists WHERE len(l) >= 2)),
      |cb AS (SELECT prev, cur, count(*) AS cb FROM bi GROUP BY 1, 2),
      |cp AS (SELECT prev, count(*) AS cp FROM bi GROUP BY 1),
      |cbk AS (SELECT prev, cur, cb FROM cb ORDER BY cb DESC, prev, cur LIMIT 60),
      |cuk AS (SELECT term, cu AS cuk FROM cu ORDER BY cu DESC, term LIMIT 60),
      |p AS (
      |  SELECT bi.doc_id,
      |    CASE WHEN cbk.cb IS NOT NULL THEN
      |      0.75 * (CAST(cbk.cb AS DOUBLE) / cp.cp) +
      |      0.25 * (CAST(cu.cu AS DOUBLE) / (SELECT t FROM tot))
      |    ELSE
      |      0.25 * (CAST(coalesce(cuk.cuk, 1) AS DOUBLE) / (SELECT t FROM tot))
      |    END AS p
      |  FROM bi
      |  LEFT JOIN cbk USING (prev, cur)
      |  JOIN cp USING (prev)
      |  JOIN cu ON cu.term = bi.cur
      |  LEFT JOIN cuk ON cuk.term = bi.cur)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(-avg(ln(p)), 6) AS mean_surprisal
      |FROM p GROUP BY 1""".stripMargin) { (s, dir) =>
    TextStats.bigramSurprisal(
      Tables.load(s, dir, "documents"), "doc_id", "text", lambda = 0.75,
      vocabCap = Some(60))
  }

  /** The LSH hot-bucket guard in its BINDING regime, gate-checked from
    * BOTH sides: the corpus is docs < 100 plus two synthetic clone
    * families — 12 exact clones of doc 1 (13 members, every band
    * bucket > maxBucket = 8, so the guard drops the family and its
    * O(13²) pair blowup never reaches the wire) and 4 exact clones of
    * doc 2 (5 members, under the cap, so its C(5,2) = 10 pairs at
    * jaccard 1.0 MUST survive — the output is deterministically
    * non-empty, proving the guard prunes rather than blanket-drops).
    * The oracle replays the clone construction AND the
    * bucket-population filter, so the guard's miss semantics — not
    * just its happy path — are hash-compared cross-engine. */
  val qMinhashHotBucket: QueryDef = QueryDef(
    "q164_minhash_hot_bucket",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 100
       |  UNION ALL
       |  SELECT CAST(9000 + g.i AS BIGINT) AS doc_id, b.text
       |  FROM documents b, generate_series(1, 12) g(i) WHERE b.doc_id = 1
       |  UNION ALL
       |  SELECT CAST(9500 + g.i AS BIGINT) AS doc_id, b.text
       |  FROM documents b, generate_series(1, 4) g(i) WHERE b.doc_id = 2),
       |t AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
       |  FROM corpus),
       |${MinhashOracle.cteChain("t", mhParams, 0.4, Some(8))}
       |SELECT id_a, id_b, jaccard FROM verified_min""".stripMargin) { (s, dir) =>
    val base = Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    def family(src: Long, n: Int, idBase: Long) =
      base.filter(col("doc_id") === src)
        .select(explode(sequence(lit(1), lit(n))).as("i"), col("text"))
        .select((col("i").cast("long") + idBase).as("doc_id"), col("text"))
    Dedup.nearDuplicates(
      base.unionByName(family(1L, 12, 9000L)).unionByName(family(2L, 4, 9500L)),
      "doc_id", "text", minJaccard = 0.4, mhParams, maxBucket = Some(8))
  }

  /** The sign-LSH hot-bucket guard in its BINDING regime — q164's
    * pattern for vectors, motivated by a measured defect: at fixed
    * nPlanes a clustered corpus concentrates in few sign-buckets, and
    * the sf100 audit clocked q117's in-bucket verify at 9.6 → 149 s
    * for 2.06× the vectors (alpha ≈ 3.9) under a perfectly flat
    * shuffle ratio (the blow-up the byte audit CANNOT see). Corpus: the full embeddings table plus
    * two planted families — 20 clones of vec 1 (bucket ≥ 21 > cap in
    * every band alongside its cluster mates, so its O(21²) pair blowup
    * is dropped) and 5 clones of a synthetic checkerboard unit vector
    * far from every centroid (its bucket holds just the family at
    * driver SFs, under the cap, so its C(5,2) = 10 pairs at cosine 1.0
    * MUST survive). The guard drops every dense cluster bucket too —
    * at production thresholds those are exactly the buckets where
    * 8-plane sign-LSH has stopped discriminating (the caller-owned
    * alternative is more planes + more bands; Dedup scaladoc). The
    * oracle replays families, banding, AND the bucket-population
    * filter, so the miss semantics are hash-compared cross-engine. */
  val qVectorHotBucket: QueryDef = {
    val bandSelects = (0 until 2).map { bnd =>
      s"SELECT vec_id, v, $bnd AS band, " +
        s"${lshBucketSql(64, 8, 42L + bnd)} AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    QueryDef(
      "q165_vector_hot_bucket",
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |              FROM embeddings),
         |fam_over AS (
         |  SELECT CAST(9000 + g.i AS BIGINT) AS vec_id, b.v
         |  FROM base b, generate_series(1, 20) g(i) WHERE b.vec_id = 1),
         |fam_under AS (
         |  SELECT CAST(9500 + g.i AS BIGINT) AS vec_id,
         |    CAST(list_transform(range(0, 64),
         |      j -> CASE WHEN j % 2 = 0 THEN 0.125 ELSE -0.125 END)
         |      AS DOUBLE[]) AS v
         |  FROM generate_series(1, 5) g(i)),
         |e AS (SELECT * FROM base UNION ALL SELECT * FROM fam_over
         |      UNION ALL SELECT * FROM fam_under),
         |b AS ($bandSelects),
         |g AS (SELECT vec_id, v, band, bucket FROM (
         |        SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bn
         |        FROM b) WHERE bn <= 16)
         |SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
         |  round(list_cosine_similarity(a.v, c.v), 6) AS cosine
         |FROM g a JOIN g c
         |  ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE round(list_cosine_similarity(a.v, c.v), 6) >= 0.9""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val famOver = base.filter(col("vec_id") === 1)
        .select(explode(sequence(lit(1), lit(20))).as("i"), col("embedding"))
        .select((col("i").cast("long") + 9000L).as("vec_id"), col("embedding"))
      val checker = array((0 until 64).map(j =>
        lit(if (j % 2 == 0) 0.125d else -0.125d)): _*)
      val famUnder = base.sparkSession.range(1, 6)
        .select((col("id") + 9500L).as("vec_id"), checker.as("embedding"))
      Dedup.embeddingNearDupsBucketed(
        base.unionByName(famOver).unionByName(famUnder),
        "vec_id", "embedding", minCosine = 0.9, dim = 64, nPlanes = 8,
        bands = 2, maxBucket = Some(16))
    }
  }

  /** Perceptual MEDIA near-dup (q204): the dHash-analog pipeline over
    * binary blobs — proportional-region byte profile ("resize"),
    * 63-bit gradient signature, 3×21-bit banding (sized so buckets
    * stay honest to ~10^8 blobs — the Multimodal scaladoc's
    * saturation arithmetic), hot-bucket guard,
    * exact Hamming verify — end-to-end on a corpus of the documents
    * blobs plus a planted near-dup family (every 10th doc re-packed
    * with its first two bytes replaced: the fixed-dimension re-encode
    * shape, which moves only region 0's average). Every stage is
    * exact-integer, so DuckDB replays the WHOLE pipeline from ord()
    * byte sums to bit_count(xor) — a hash-gated guarantee that the
    * signature, banding, guard, and verify all agree bit-for-bit.
    * The ASCII corpus makes byte == code point. */
  val qMediaNearDup: QueryDef = QueryDef(
    "q204_media_neardup",
    """WITH corpus AS (
      |  SELECT doc_id AS media_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS media_id,
      |    'zz' || substring(text, 3) AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |t AS (SELECT media_id, text, length(text) AS n FROM corpus),
      |r AS (
      |  SELECT media_id, k,
      |    CASE WHEN ((k+1)*n)//64 > (k*n)//64 THEN
      |      CAST(list_sum(list_transform(
      |        string_split(substring(text, (k*n)//64 + 1,
      |          ((k+1)*n)//64 - (k*n)//64), ''), c -> ord(c))) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS sm,
      |    CAST(((k+1)*n)//64 - (k*n)//64 AS BIGINT) AS ln
      |  FROM t, generate_series(0, 63) g(k)),
      |w AS (
      |  SELECT media_id, k, sm, ln,
      |    lead(sm) OVER (PARTITION BY media_id ORDER BY k) AS sm2,
      |    lead(ln) OVER (PARTITION BY media_id ORDER BY k) AS ln2
      |  FROM r),
      |sig AS (
      |  SELECT media_id,
      |    CAST(coalesce(sum(CASE WHEN k < 63 AND sm2 * ln > sm * ln2
      |      THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END), 0)
      |      AS BIGINT) AS sig
      |  FROM w GROUP BY 1),
      |bv AS (
      |  SELECT media_id, sig, b, (sig >> (b * 21)) & 2097151 AS val
      |  FROM sig, generate_series(0, 2) gb(b)),
      |ok AS (SELECT b, val FROM bv GROUP BY 1, 2 HAVING count(*) <= 64),
      |cand AS (
      |  SELECT DISTINCT x.media_id AS media_id_a,
      |    y.media_id AS media_id_b, x.sig AS sa, y.sig AS sb
      |  FROM bv x
      |  JOIN ok ON ok.b = x.b AND ok.val = x.val
      |  JOIN bv y ON x.b = y.b AND x.val = y.val
      |    AND x.media_id < y.media_id)
      |SELECT media_id_a, media_id_b,
      |  CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 6""".stripMargin) {
    (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = docs.select(col("doc_id").as("media_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("media_id"),
            concat(lit("zz"), expr("substring(text, 3)")).as("text")))
      Multimodal.mediaNearDup(
        Multimodal.packText(corpus, "media_id", "text"),
        regions = 64, bands = 3, maxHamming = 6, bucketCap = 64)
  }

  /** SHIFT-RESISTANT media near-dup (q206): content-defined chunk
    * fingerprints ([[Multimodal.cdcChunkHashes]] — 8-byte windowed
    * 131-polynomial, boundary ≡ 0 mod 32) + guarded fingerprint
    * self-join + exact Jaccard verify. The planted families are
    * exactly the edits q204's proportional-region signature CANNOT
    * survive (its documented hole): a 16-byte PREFIX INSERTION
    * (every `k·n/R` boundary shifts) and a 19-byte PREFIX DELETION —
    * both re-synchronize under local chunking, and the sf0.01
    * prototype measured 50/50 insert-edit and 48/50 delete-edit
    * recall at Jaccard ≥ 0.5 (the misses are 1-2-chunk shorties,
    * replayed identically by the oracle). Everything is
    * exact-integer except the final Jaccard ratio (one IEEE divide,
    * rounded like q165's cosine), so DuckDB replays boundary
    * detection, chunking, fingerprints, the population guard, and
    * the verify bit-for-bit. */
  val qMediaCdcNearDup: QueryDef = QueryDef(
    "q206_media_cdc_neardup",
    """WITH corpus AS (
      |  SELECT doc_id AS media_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS media_id, 'INSERTED PREFIX ' || text
      |  FROM documents WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 3000000 AS media_id, substring(text, 20)
      |  FROM documents WHERE doc_id % 10 = 2),
      |t AS (SELECT media_id, text, length(text) AS n FROM corpus),
      |b AS (
      |  SELECT media_id, i FROM t, generate_series(8, 1024) g(i)
      |  WHERE i <= n AND (CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT)
      |       + CAST(ord(substring(text, CAST(i-1 AS INT), 1)) AS BIGINT) * 131
      |       + CAST(ord(substring(text, CAST(i-2 AS INT), 1)) AS BIGINT) * 17161
      |       + CAST(ord(substring(text, CAST(i-3 AS INT), 1)) AS BIGINT) * 2248091
      |       + CAST(ord(substring(text, CAST(i-4 AS INT), 1)) AS BIGINT) * 294499921
      |       + CAST(ord(substring(text, CAST(i-5 AS INT), 1)) AS BIGINT) * 38579489651
      |       + CAST(ord(substring(text, CAST(i-6 AS INT), 1)) AS BIGINT) * 5053913144281
      |       + CAST(ord(substring(text, CAST(i-7 AS INT), 1)) AS BIGINT) * 662062621900811) % 32 = 0),
      |c AS (
      |  SELECT t.media_id, t.text, t.n,
      |    list_sort(coalesce(list(b.i) FILTER (b.i IS NOT NULL),
      |      CAST([] AS BIGINT[]))) AS bl
      |  FROM t LEFT JOIN b ON b.media_id = t.media_id
      |  GROUP BY t.media_id, t.text, t.n),
      |c2 AS (
      |  SELECT media_id, text,
      |    CASE WHEN len(bl) = 0 OR bl[len(bl)] <> n
      |         THEN bl || [CAST(n AS BIGINT)] ELSE bl END AS ends
      |  FROM c),
      |ch AS (
      |  SELECT media_id, substring(text,
      |      CAST(CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END AS INT),
      |      CAST(ends[k] - CASE WHEN k = 1 THEN 0 ELSE ends[k-1] END AS INT)) AS chunk
      |  FROM c2, generate_series(1, 1024) g(k)
      |  WHERE k <= len(ends) AND ends[k] > CASE WHEN k = 1 THEN 0 ELSE ends[k-1] END),
      |h AS (
      |  SELECT DISTINCT media_id,
      |    list_reduce(list_prepend(CAST(7 AS BIGINT),
      |      list_transform(string_split(chunk, ''), cc -> CAST(ord(cc) AS BIGINT))),
      |      (acc, x) -> (acc * 131 + x) % 1000000007) AS chunk_hash
      |  FROM ch),
      |ok AS (SELECT chunk_hash FROM h GROUP BY 1 HAVING count(*) <= 64),
      |g AS (SELECT h.media_id, h.chunk_hash FROM h JOIN ok USING (chunk_hash)),
      |gs AS (SELECT media_id, count(*) AS sz FROM g GROUP BY 1),
      |inter AS (
      |  SELECT a.media_id AS media_id_a, b2.media_id AS media_id_b,
      |    count(*) AS ints
      |  FROM g a JOIN g b2 ON a.chunk_hash = b2.chunk_hash
      |    AND a.media_id < b2.media_id
      |  GROUP BY 1, 2)
      |SELECT media_id_a, media_id_b,
      |  round(CAST(ints AS DOUBLE) / (sa.sz + sb.sz - ints), 6) AS jaccard
      |FROM inter
      |JOIN gs sa ON sa.media_id = inter.media_id_a
      |JOIN gs sb ON sb.media_id = inter.media_id_b
      |WHERE CAST(ints AS DOUBLE) / (sa.sz + sb.sz - ints) >= 0.5""".stripMargin) {
    (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = docs.select(col("doc_id").as("media_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 2000000L).as("media_id"),
            concat(lit("INSERTED PREFIX "), col("text")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 10 === 2)
          .select((col("doc_id") + 3000000L).as("media_id"),
            expr("substring(text, 20)").as("text")))
      Multimodal.mediaNearDupCdc(
        Multimodal.packText(corpus, "media_id", "text"),
        minJaccard = 0.5, chunkCap = 64, window = 8, divisor = 32L)
  }

  val all: Seq[QueryDef] = Seq(qDedupExact, qNgramJaccard, qMinhashLsh,
    qSimhash, qAnnBrute, qAnnLsh, qAnnIvf, qAnnRecall, qIvfRecall,
    qAnnPq, qAnnPqRecall,
    qDedupEmbedding,
    qDedupEmbeddingLsh, qTokenStats, qQuality, qLangId,
    qFingerprint, qMultimodal, qTfidf, qApproxPercentile, qSplit, qStratified,
    qVectorQuantize, qFrameSample, qSurprisal, qBigramSurprisal,
    qBigramSurprisalCapped, qMinhashHotBucket, qVectorHotBucket,
    qVectorIndexDedup, qRandomProjection, qMediaNearDup, qMediaCdcNearDup)
}
