package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — the BM25 side of the search story (the
  * ANN operators in [[Similarity]] are its dense counterpart).
  *
  * Scale shape: both subtrees derive from ONE shared tokenized
  * projection ([[tokenized]]); the one-shot [[bm25]] still SCANS the
  * corpus twice (postings + corpus stats are independent aggregates —
  * that is inherent to the declarative one-shot form), while the
  * production path is the incremental pair [[bm25StatsDelta]] +
  * [[bm25WithStats]], which tokenizes each document exactly once at
  * ingest and never re-reads the corpus to score. The gram explode is
  * filtered to the query-term set BEFORE any shuffle, so the
  * (doc, term) aggregate carries only matching postings (≪ corpus
  * tokens); document-frequency and the (N, avgdl) corpus stats are
  * term-count / single-row frames broadcast into the scoring
  * projection; the final top-k is a rank window over the scored
  * postings (WindowGroupLimit prunes). Nothing ever shuffles the text
  * column.
  *
  * Determinism: every float is derived from exact longs (tf, df, N,
  * Σdl) with a fixed expression shape — avgdl is exact-sum-then-divide,
  * NOT a float avg (partial-sum order would differ between engines) —
  * so scores are bit-stable and oracle-checkable. Multi-term document
  * scores ([[bm25Query]]) sum the per-term scores in the CALLER'S term
  * order as one fixed left-to-right expression, never a float `sum`
  * aggregate whose combine order could vary.
  */
object Retrieval {

  /** (idCol, __toks, __dl) — the single tokenized projection every
    * other frame here derives from. */
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__dl"))

  /** (idCol, __dl, __t, __tf) postings for the query-term set — the
    * per-document side of BM25, shared by the one-shot and
    * incremental-stats forms. */
  private def postings(toks: DataFrame, idCol: String,
      terms: Seq[String]): DataFrame =
    toks
      .select(col(idCol), col("__dl"),
        explode_outer(col("__toks")).as("__t"))
      // isNotNull is generate hygiene (Dedup class doc); isInCollection
      // subsumes it but stating both keeps the contract explicit
      .filter(col("__t").isNotNull && col("__t").isInCollection(terms))
      .groupBy(col(idCol), col("__t"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))

  /** Per-batch corpus-stats DELTA: (stat, key, n) rows —
    * ('df', term, docs-containing-term), ('corpus', 'n_docs', batch
    * size), ('corpus', 'sum_dl', batch token count). All three are
    * ADDITIVE, so the current corpus stats are a sum-by-key over
    * appended deltas (the IncrementalGold decomposability argument):
    * a retrieval deployment appends one tiny delta per ingest batch
    * and never re-scans the corpus to refresh df/N/avgdl. */
  def bm25StatsDelta(batch: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = tokenized(batch, idCol, textCol)
    val corpus = toks.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__s"))
      .select(explode(array(
        struct(lit("corpus").as("stat"), lit("n_docs").as("key"),
          col("__n").as("n")),
        struct(lit("corpus").as("stat"), lit("sum_dl").as("key"),
          col("__s").as("n")))).as("r"))
      .select("r.stat", "r.key", "r.n")
    val dfreq = toks
      .select(col(idCol), explode_outer(col("__toks")).as("__t"))
      .filter(col("__t").isNotNull && col("__t").isInCollection(terms))
      .select(col(idCol), col("__t")).distinct()
      .groupBy(col("__t")).agg(count(lit(1)).as("n"))
      .select(lit("df").as("stat"), col("__t").as("key"), col("n"))
    corpus.unionByName(dfreq)
  }

  /** Score postings against MAINTAINED stats (the sum-by-key fold of
    * appended [[bm25StatsDelta]] rows) — same float shape as [[bm25]],
    * with N and Σdl exact longs, so the two forms are bit-identical
    * on the same corpus. */
  def bm25WithStats(docs: DataFrame, statsRows: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (dfreq, corpus) = foldStats(statsRows)
    rankPerTerm(scoredPostings(
      postings(tokenized(docs, idCol, textCol), idCol, terms),
      dfreq, corpus, k1, b), idCol, k)
  }

  /** (dfreq, corpus) frames from maintained additive stats rows. */
  private def foldStats(statsRows: DataFrame): (DataFrame, DataFrame) = {
    val folded = statsRows.groupBy(col("stat"), col("key"))
      .agg(sum(col("n")).as("n"))
    val corpus = folded.filter(col("stat") === "corpus")
      .groupBy()
      .agg(max(when(col("key") === "n_docs", col("n"))).as("__N"),
        max(when(col("key") === "sum_dl", col("n"))).as("__sumdl"))
      .select(col("__N"),
        (col("__sumdl").cast("double") / col("__N")).as("__avgdl"))
    val dfreq = folded.filter(col("stat") === "df")
      .select(col("key").as("__t"), col("n").as("__df"))
    (dfreq, corpus)
  }

  /** Top-k documents per query term by BM25 (Robertson/Lucene IDF:
    * ln((N - df + 0.5)/(df + 0.5) + 1)). Output:
    * (term, idCol, score rounded to 6, rank ≤ k). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    val tf = postings(toks, idCol, terms)
    val stats = toks.agg(count(lit(1)).as("__N"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    rankPerTerm(scoredPostings(tf, dfreq, stats, k1, b), idCol, k)
  }

  /** The user-facing retrieval shape: a multi-term QUERY scored per
    * document — score(doc) = Σ over query terms of the q138 per-term
    * BM25 score — then top-k documents. The sum is a FIXED left-to-
    * right chain of coalesce(score_t, 0) in the caller's term order
    * (one expression per term out of a pivot), not a float aggregate,
    * so the total is bit-stable and the oracle replays it verbatim.
    * Output: (idCol, score rounded to 6, rank ≤ k). */
  def bm25Query(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    val tf = postings(toks, idCol, terms)
    val stats = toks.agg(count(lit(1)).as("__N"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    rankPerDoc(scoredPostings(tf, dfreq, stats, k1, b), idCol, terms, k)
  }

  /** [[bm25Query]] against MAINTAINED stats (the q139 decomposition
    * applied to the per-document form): postings come from the batch
    * being scored, df/N/Σdl from folded [[bm25StatsDelta]] rows — the
    * corpus is never re-scanned, and the scores are bit-identical to
    * the one-shot [[bm25Query]] on the same corpus (shared oracle). */
  def bm25QueryWithStats(docs: DataFrame, statsRows: DataFrame,
      idCol: String, textCol: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (dfreq, corpus) = foldStats(statsRows)
    rankPerDoc(scoredPostings(
      postings(tokenized(docs, idCol, textCol), idCol, terms),
      dfreq, corpus, k1, b), idCol, terms, k)
  }

  /** Pivot per-term scores into fixed slots, add in the caller's term
    * order (deterministic float combine, unlike a `sum` aggregate),
    * then take the global top-k WITHOUT a global rank window: an
    * ordered limit plans as TakeOrderedAndProject — per-partition
    * top-k heaps merged once — where the previous
    * row_number-then-filter funneled every matched document to ONE
    * partition first (a common query term's postings are a large
    * corpus fraction, so that was a single-partition sort of
    * corpus-scale rows; RetrievalSpec pins the new shape). The order
    * is total (score desc, id asc), so the k-prefix is deterministic
    * and the rank window that numbers it runs over ≤ k rows. */
  private def rankPerDoc(scored: DataFrame, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val perTerm: Seq[Column] = terms.map(t =>
      coalesce(max(when(col("__t") === t, col("score"))), lit(0.0)))
    val total = round(perTerm.reduce(_ + _), 6)
    scored.groupBy(col(idCol))
      .agg(total.as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol).asc)).cast("int"))
      .select(col(idCol), col("score"), col("rank"))
  }

  /** Per-(doc, term) BM25 scores (rounded to 6), shared by the
    * per-term and per-document ranking forms. */
  private def scoredPostings(tf: DataFrame, dfreq: DataFrame,
      stats: DataFrame, k1: Double, b: Double): DataFrame =
    tf
      .join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(stats.select(col("__N"), col("__avgdl"))))
      .withColumn("__idf",
        log((col("__N") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
          + lit(1.0)))
      .withColumn("score", round(
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))), 6))

  private def rankPerTerm(scored: DataFrame, idCol: String,
      k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("__t"))
          .orderBy(col("score").desc, col(idCol).asc)))
      .filter(col("rank") <= k)
      .select(col("__t").as("term"), col(idCol), col("score"), col("rank"))

  /** BATCH multi-query BM25: score a whole query WORKLOAD in one
    * pass — the postings explode, document-frequency, and corpus
    * stats are computed ONCE over the union of all query terms, then
    * a broadcast (query, term) mapping fans each scored posting out
    * to the queries that asked for it and a per-(query, doc)
    * aggregate applies the q141 pivot chain. Versus one [[bm25Query]]
    * plan per query, this is 2 corpus scans total instead of 2 per
    * query, and the rank window is PARTITIONED by query (parallel,
    * never a single-partition sort).
    *
    * Determinism: each query's total is a `when(__qid === q, chain_q)`
    * slot whose chain adds the pivot slots in THAT QUERY'S OWN term
    * order — not the union order, which would re-associate the float
    * sum whenever two queries share a term at different relative
    * positions (FP addition is non-associative; the union-order form
    * this replaced was one ulp off across a round(·,6) boundary in
    * that case). Absent terms contribute an exact `0.0` (coalesce) and
    * `x + 0.0` is exact in IEEE arithmetic, so each total is
    * bit-identical to its standalone [[bm25Query]] chain with no
    * precondition on term overlap or order (SelectionSpec asserts
    * equality on overlapping, differently-ordered specs). Catalyst
    * dedupes the shared `max(when(__t = t, score))` aggregate slots
    * across queries, so the aggregate still carries one slot per
    * DISTINCT term. Output: `(query_id, idCol, score, rank ≤ k)`. */
  def bm25Queries(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = tokenized(docs, idCol, textCol)
    val tf = postings(toks, idCol, allTerms)
    val stats = toks.agg(count(lit(1)).as("__N"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val sp = docs.sparkSession
    import sp.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("__qid", "__t")
    def chain(ts: Seq[String]): Column = ts.map(t =>
      coalesce(max(when(col("__t") === t, col("score"))), lit(0.0)))
      .reduce(_ + _)
    val total = round(queries.tail.foldLeft(
      when(col("__qid") === queries.head._1, chain(queries.head._2))) {
        case (acc, (q, ts)) => acc.when(col("__qid") === q, chain(ts))
      }, 6)
    scoredPostings(tf, dfreq, stats, k1, b)
      .join(broadcast(qt), Seq("__t"))
      .groupBy(col("__qid"), col(idCol))
      .agg(total.as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("__qid"))
          .orderBy(col("score").desc, col(idCol).asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col(idCol), col("score"),
        col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of a lexical and a
    * dense ranked list — the standard hybrid-retrieval combiner
    * (Elasticsearch/Vespa/OpenSearch all ship exactly this):
    * `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, with a document absent
    * from a list contributing 0 for that list. Inputs are per-query
    * ranked lists `(queryCol, idCol, rankCol)` — typically
    * [[bm25Query]] output unioned per query and a per-query ANN top-k
    * from [[Similarity]]. Output:
    * `(queryCol, idCol, lex_rank, vec_rank, rrf_score, rank ≤ k)`.
    *
    * Scale shape: both inputs are ALREADY top-k-per-query lists —
    * ≤ n_queries × k rows each, however large the corpus behind them —
    * so the fusion join and the per-query rank window cost O(n_q · k)
    * regardless of corpus size; the heavy lifting stays inside the
    * audited BM25/ANN kernels. Determinism: ranks are exact ints,
    * 1/(k0+rank) and the two-term sum are single correctly-rounded
    * IEEE ops in a fixed order, so fused scores are bit-stable
    * cross-engine with NO rounding step; ties break by id. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, queryCol: String,
      idCol: String, rankCol: String, k0: Int = 60,
      k: Int = 10): DataFrame = {
    require(k0 >= 1, "k0 must be >= 1")
    val l = lex.select(col(queryCol).as("__q"), col(idCol).as("__id"),
      col(rankCol).cast("int").as("lex_rank"))
    val d = dense.select(col(queryCol).as("__q"), col(idCol).as("__id"),
      col(rankCol).cast("int").as("vec_rank"))
    l.join(d, Seq("__q", "__id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0) + col("vec_rank")), lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("__q"))
          .orderBy(col("rrf_score").desc, col("__id").asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("__q").as(queryCol), col("__id").as(idCol),
        col("lex_rank"), col("vec_rank"), col("rrf_score"), col("rank"))
  }
}
