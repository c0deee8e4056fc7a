package graft.queries

import graft.scale.Dedup

/** Shared DuckDB-oracle SQL fragments replaying the reproducible-hash
  * MinHash pipeline (used by q42, the q100/q130 curation pipelines and
  * the q132 incremental-index dedup — one source of truth for the
  * signature/banding replay). */
private[queries] object MinhashOracle {

  /** CTE chain from a relation `src`(doc_id, toks) through shingling,
    * md5-60 hashing, the k inlined permutation mins, band buckets.
    * Exposes CTEs `{pre}sh`(doc_id, shingles), `{pre}sig`(doc_id, sig)
    * and `{pre}bands`(doc_id, band, bucket) — the prefix lets one
    * oracle carry TWO signature chains (corpus + batch, q132). */
  def sigChain(src: String, p: Dedup.MinHashParams,
      pre: String = ""): String = {
    val mins = Dedup.coeffs(p).zipWithIndex.map { case ((a, b), i) =>
      s"min((h.x * $a + $b) % ${Dedup.Prime}) AS m$i"
    }.mkString(",\n      ")
    val sigList = (0 until p.k).map(i => s"m$i").mkString("[", ", ", "]")
    val r = p.rowsPerBand
    s"""${pre}sh AS (
       |  SELECT doc_id, list_distinct(list_filter(
       |    list_transform(range(0, greatest(len(toks) - ${p.shingle}, 0) + 1),
       |      i -> array_to_string(toks[i + 1 : i + ${p.shingle}], ' ')),
       |    x -> x <> '')) AS shingles
       |  FROM $src),
       |${pre}hx AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(substring(md5(s.s), 1, 15), ''),
       |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
       |    (a, d) -> a * 16 + d) % ${Dedup.Prime} AS x
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM ${pre}sh) s),
       |${pre}mh AS (SELECT doc_id,
       |      $mins
       |  FROM ${pre}hx h GROUP BY doc_id),
       |${pre}sig AS (SELECT doc_id, $sigList AS sig FROM ${pre}mh),
       |${pre}bands AS (
       |  SELECT doc_id, g.b AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(substring(
       |        md5(array_to_string(sig[g.b * $r + 1 : g.b * $r + $r], ',')),
       |        1, 15), ''),
       |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
       |      (a, d) -> a * 16 + d) AS bucket
       |  FROM ${pre}sig, generate_series(0, ${p.bands - 1}) g(b))""".stripMargin
  }

  /** [[sigChain]] plus self-join candidate pairs and exact-jaccard
    * verification. Exposes CTEs: `sh`(doc_id, shingles),
    * `cand`(id_a, id_b) and `verified`/`verified_min`
    * (id_a, id_b, jaccard ≥ minJaccard). `maxBucket` replays the
    * engine's hot-bucket guard ([[graft.scale.Dedup.candidatePairs]]):
    * (band, bucket) groups above the cap contribute no candidates —
    * the SAME filter in both engines, so the gate stays aligned even
    * on a corpus where the cap binds. */
  def cteChain(src: String, p: Dedup.MinHashParams,
      minJaccard: Double, maxBucket: Option[Int] = None): String = {
    // the guard is hoisted into ONE named CTE rather than inlined into
    // both self-join sides: the bands group-by is the oracle's heaviest
    // aggregation at big SFs, and a textual duplicate would evaluate it
    // twice in an engine already at its memory limit (sf10 needed
    // check.py's temp-spill as it is)
    val guardCte = maxBucket.fold("") { cap =>
      s"""bands_ok AS (
         |  SELECT b.* FROM bands b JOIN (
         |    SELECT band, bucket FROM bands
         |    GROUP BY band, bucket HAVING count(*) <= $cap) ok
         |    USING (band, bucket)),
         |""".stripMargin
    }
    val bandRel = if (maxBucket.isDefined) "bands_ok" else "bands"
    s"""${sigChain(src, p)},
       |${guardCte}cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM $bandRel a JOIN $bandRel b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT id_a, id_b,
       |    round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
       |      (len(sa.shingles) + len(sb.shingles)
       |       - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
       |  FROM cand
       |  JOIN sh sa ON cand.id_a = sa.doc_id
       |  JOIN sh sb ON cand.id_b = sb.doc_id)""".stripMargin +
      s",\nverified_min AS (SELECT * FROM verified WHERE jaccard >= $minJaccard)"
  }
}
