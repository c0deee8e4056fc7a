package graft

import graft.core.Tables
import graft.scale.{Decontaminate, Selection, Spans, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 training-data additions: repeated-span detection, token
  * chunking, embedding decontamination, DSIR importance weights. */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- Spans.repeatedSpans ---------------------------------------------

  test("repeatedSpans flags cross-doc shared spans, not intra-doc repeats") {
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    val selfRep = (1 to 8).map(i => s"own$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler unique one two three four"),
      (2L, s"$boiler other words entirely here now"),
      // the same 8-token span twice WITHIN one doc, nowhere else
      (3L, s"$selfRep $selfRep"),
      (4L, "totally unrelated text with enough tokens to span")
    ).toDF("doc_id", "text")
    val out = Spans.repeatedSpans(df, "doc_id", "text", n = 8, stride = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // docs 1/2 share the 12-token boilerplate prefix → ≥1 aligned
    // window each (shared length 12 ≥ n + stride − 1 = 11)
    assert(out(1L)._2 >= 1, s"doc 1 should have dup spans: $out")
    assert(out(2L)._2 >= 1, s"doc 2 should have dup spans: $out")
    // intra-doc repetition is NOT cross-doc duplication
    assert(out(3L)._2 === 0, s"doc 3 repeats only itself: $out")
    assert(out(4L)._2 === 0)
  }

  test("repeatedSpans keeps short docs with zero spans; window math exact") {
    val df = Seq(
      (1L, "only three tokens"),                       // < n → 0 spans
      (2L, (1 to 8).map("w" + _).mkString(" ")),       // exactly n → 1
      (3L, (1 to 13).map("x" + _).mkString(" ")),      // 13 → k=2 (0,4)
      (4L, "")                                          // no tokens
    ).toDF("doc_id", "text")
    val out = Spans.repeatedSpans(df, "doc_id", "text", n = 8, stride = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("repeatedSpans plan: exactly two narrow-key exchanges, text never shuffles") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Spans.repeatedSpans(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      s"expected span-hash window + per-doc agg exchanges only:\n$plan")
    assert(plan.contains("hashpartitioning(__sh"),
      "the window must partition on the 8-byte span hash")
    assert(!plan.contains("hashpartitioning(text") &&
      !plan.contains("hashpartitioning(__toks"),
      "neither text nor token arrays may be a shuffle key")
  }

  // ---- Spans.chunk ------------------------------------------------------

  test("chunk covers every token, minimal count, overlap exact") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .limit(200)
    val size = 32; val overlap = 8; val stride = size - overlap
    val toks = docs.select(col("doc_id"),
      graft.scale.TextStats.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val chunks = Spans.chunk(docs, "doc_id", "text", size, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    for ((id, t) <- toks) {
      val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2)
      if (t.isEmpty) assert(cs.isEmpty, s"doc $id: empty doc must not chunk")
      else {
        // minimal covering count
        val expected = if (t.size <= size) 1
          else 1 + math.ceil((t.size - size).toDouble / stride).toInt
        assert(cs.length === expected, s"doc $id chunk count")
        // every chunk is the exact token slice at its offset
        for ((_, i, n, text) <- cs) {
          val slice = t.slice(i * stride, i * stride + size)
          assert(n === slice.size && text === slice.mkString(" "),
            s"doc $id chunk $i content")
        }
        // full coverage: last chunk reaches the final token
        assert((cs.last._2 * stride + size) >= t.size, s"doc $id coverage")
      }
    }
  }

  test("chunk plan is shuffle-free (pure Generate)") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Spans.chunk(docs, "doc_id", "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  // ---- Spans.exciseRepeatedSpans ----------------------------------------

  test("exciseRepeatedSpans cuts covered tokens from later docs only") {
    // letter-only tokens: the tokenizer splits on [^a-z]+, digits vanish
    val boiler = ('a' to 'l').map(c => s"b$c").mkString(" ")
    val df = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, "nothing shared with anyone here at all eight")
    ).toDF("doc_id", "text")
    val out = Spans.exciseRepeatedSpans(df, "doc_id", "text", 8, 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1 owns the boilerplate (min id) — keeps everything
    assert(out(1L) === ((16L, 0L, s"$boiler alpha beta gamma delta")))
    // doc 2: windows at start 0 (toks 0-7) and 4 (4-11) match doc 1 →
    // positions 0-11 cut; window at 8 mixes boiler+tail, no match
    assert(out(2L) === ((16L, 12L, "epsilon zeta eta theta")))
    assert(out(3L) === ((8L, 0L, "nothing shared with anyone here at all eight")))
  }

  test("exciseRepeatedSpans: full excision, short and empty docs survive") {
    val same = ('a' to 'p').map(c => s"c$c").mkString(" ")
    val df = Seq(
      (1L, same), (2L, same),          // doc 2 fully covered (3 windows)
      (3L, "short doc"),                // < n → no windows, untouched
      (4L, "")                          // zero tokens
    ).toDF("doc_id", "text")
    val out = Spans.exciseRepeatedSpans(df, "doc_id", "text", 8, 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) === ((16L, 0L, same)))
    assert(out(2L) === ((16L, 16L, "")))
    assert(out(3L) === ((2L, 0L, "short doc")))
    assert(out(4L) === ((0L, 0L, "")))
  }

  test("exciseRepeatedSpans keeps the winner's intra-doc repeats") {
    val rep = ('a' to 'h').map(c => s"r$c").mkString(" ")
    val df = Seq((1L, s"$rep $rep"), (2L, "unrelated words only"))
      .toDF("doc_id", "text")
    val out = Spans.exciseRepeatedSpans(df, "doc_id", "text", 8, 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1 is its own winner — repeats are NOT cross-doc duplication
    assert(out(1L) === ((0L, s"$rep $rep")))
  }

  test("exciseRepeatedSpans plan: loser detection is hash-keyed; no text " +
      "column is ever a shuffle KEY") {
    // the loser window and the per-doc removed-position fold shuffle
    // hashes and ints only; the rebuild is one left join of that
    // narrow frame onto the tokenized docs (text crosses the wire at
    // most once, as join PAYLOAD — the per-token-row reassembly this
    // replaced measured 15× compressed source + 6.5 GB spill at KB
    // docs). What this pins is that text is never a shuffle KEY and
    // the loser side stays narrow.
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Spans.exciseRepeatedSpans(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__sh"),
      "the loser window must partition on the span hash")
    assert(!plan.contains("hashpartitioning(text") &&
      !plan.contains("hashpartitioning(__toks") &&
      !plan.contains("hashpartitioning(__tok,"),
      s"no text column may be a shuffle key:\n$plan")
  }

  // ---- Decontaminate.embeddingOverlap -----------------------------------

  test("embeddingOverlap flags an exact benchmark copy and clears orthogonals") {
    val bench = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),   // same direction → sim 1.0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal → sim 0.0
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f))    // close → sim ≈ 0.9938
    ).toDF("vec_id", "embedding")
    val out = Decontaminate
      .embeddingOverlap(corpus, bench, "vec_id", "embedding", 0.95)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(3))).toMap
    assert(out(1L) === ((1.0, 1)))
    assert(out(2L) === ((0.0, 0)))
    assert(out(3L)._1 > 0.99 && out(3L)._2 === 1)
  }

  test("embeddingOverlap plan: bench broadcasts, corpus never shuffles pre-agg") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val plan = Decontaminate.embeddingOverlap(
      emb.filter(col("vec_id") % 50 =!= 0), emb.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", 0.9).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("BroadcastExchange"), s"bench side must broadcast:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      "only the (vec_id, partial-agg) rows may shuffle")
  }

  // ---- Selection.dsirWeights -------------------------------------------

  test("dsirWeights ranks target-like docs above disjoint-vocab docs") {
    val target = (1 to 20).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "zzz qqq xxx vvv kkk jjj www yyy uuu ppp"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Selection.dsirWeights(raw, target, "doc_id", "text", 256)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toMap
    assert(out(1L)._2 > out(2L)._2, s"target-like must outrank: $out")
    assert(out(1L)._3 === 1 && out(2L)._3 === 0)
    assert(out(3L) === ((0L, 0.0, 0)), "zero-gram docs survive with weight 0")
  }

  // ---- Selection.budgetSelect ------------------------------------------

  test("budgetSelect equals the naive global cumsum (exact prefix, ties by id)") {
    // adversarial: duplicate scores straddling nothing (same bin by
    // construction), a doc that exactly crosses the budget, varied sizes
    val df = Seq(
      (1L, 0.90, 100L), (2L, 0.80, 200L), (3L, 0.80, 50L),
      (4L, 0.50, 300L), (5L, 0.10, 400L), (6L, 0.10, 10L),
      (7L, 0.05, 500L)
    ).toDF("doc_id", "score", "n_tokens")
    // total 1560, budget = floor(0.5*1560) = 780
    val out = Selection.budgetSelect(df, "doc_id", "score", "n_tokens", 0.5,
      bins = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getInt(4))).toMap
    // order: 1(cb 0) 2(100) 3(300) 4(350) 5(650) 6(1050) 7(1060)
    assert(out === Map(
      1L -> ((0L, 1)), 2L -> ((100L, 1)), 3L -> ((300L, 1)),
      4L -> ((350L, 1)), 5L -> ((650L, 1)),   // crosses the budget: taken
      6L -> ((1050L, 0)), 7L -> ((1060L, 0))))
  }

  test("budgetSelect: constant scores degrade to one bin, ids break ties") {
    val df = (1L to 10L).map(i => (i, 0.5, 10L))
      .toDF("doc_id", "score", "n_tokens")
    val out = Selection.budgetSelect(df, "doc_id", "score", "n_tokens", 0.5,
      bins = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    // budget 50 → docs 1-5 have cum_before 0..40 < 50; doc 6 cb=50 → out
    assert((1L to 5L).forall(out(_) === 1) && (6L to 10L).forall(out(_) === 0))
  }

  test("budgetSelect plan: no global single-partition sort of the corpus") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"),
        TextStats.stopwordRatio(col("text")).as("score"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val plan = Selection
      .budgetSelect(docs, "doc_id", "score", "n_tokens", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bin"),
      s"the corpus prefix window must partition by bin:\n$plan")
    // the only SinglePartition movements allowed are post-partial-agg
    // tiny frames: the one-row stats reduce (evaluated for the main
    // frame and again inside the bin-offset branch) and the ≤bins-row
    // offset window — never the doc stream. Every one of them sits
    // above a partial HashAggregate, so the corpus cannot be flowing
    // through; the doc-stream window itself must partition by bin.
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 3, s"corpus must not funnel to one partition:\n$plan")
  }

  test("dsirWeights plan: the log-ratio model broadcasts into the gram stream") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Selection.dsirWeights(
      docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en"),
      "doc_id", "text", 256).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the ≤256-row model must broadcast:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "the gram-stream join must be map-side")
  }

  // ---- Retrieval.bm25Queries -------------------------------------------

  test("bm25Queries is bit-identical to per-query bm25Query; window is " +
      "partitioned by query") {
    import graft.scale.Retrieval
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    // q0 and q1 SHARE "scan" at different relative positions: a
    // union-first-occurrence pivot chain would sum q1's terms as
    // (scan+join)+vector instead of its standalone (join+vector)+scan
    // — the FP re-association bm25Queries' per-query when-slots exist
    // to prevent. q2 is disjoint (the original coverage).
    val specs = Seq(
      0L -> Seq("scan"),
      1L -> Seq("join", "vector", "scan"),
      2L -> Seq("stream", "window", "merge"))
    val batch = Retrieval.bm25Queries(docs, "doc_id", "text", specs, k = 15)
    val solo = specs.map { case (qid, terms) =>
      Retrieval.bm25Query(docs, "doc_id", "text", terms, k = 15)
        .withColumn("query_id", lit(qid))
        .select("query_id", "doc_id", "score", "rank")
    }.reduce(_ unionByName _)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    assert(batch.collect().map(key).sortBy(t => (t._1, t._4)).toSeq ===
      solo.collect().map(key).sortBy(t => (t._1, t._4)).toSeq,
      "the 0.0-padded union chain must reproduce each standalone chain")
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__qid"),
      s"the rank window must partition by query, not run global:\n$plan")
  }

  test("bm25Query plan: global top-k is TakeOrderedAndProject, never a " +
    "single-partition rank window over every matched document") {
    import graft.scale.Retrieval
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Retrieval.bm25Query(docs, "doc_id", "text",
      Seq("join", "vector", "scan"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps merged once:\n$plan")
    // the only Window left numbers the <= k-row prefix
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1,
      s"matched postings must never funnel to one partition:\n$plan")
  }

  // ---- Retrieval.rrfFuse ------------------------------------------------

  test("rrfFuse: both-list docs outrank single-list, absences are null") {
    import graft.scale.Retrieval
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q", "id", "rank")
    val den = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, den, "q", "id", "rank", k0 = 60, k = 10)
      .collect().sortBy(r => r.getInt(5))
      .map(r => (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
        r.getDouble(4)))
    // doc 11 in both lists: 1/62 + 1/61 beats 10's 1/61 beats 12's 1/62
    assert(out.map(_._1).toSeq === Seq(11L, 10L, 12L), out.mkString(","))
    assert(out(0)._4 === 1.0 / 62 + 1.0 / 61)
    assert(out(1) === ((10L, Some(1), None, 1.0 / 61)))
    assert(out(2) === ((12L, None, Some(2), 1.0 / 62)))
  }

  test("rrfFuse: ties on fused score break by id; per-query partitions") {
    import graft.scale.Retrieval
    // two queries; in q1 docs 5 and 7 get identical mirrored ranks
    val lex = Seq((1L, 5L, 1), (1L, 7L, 2), (2L, 9L, 1)).toDF("q", "id", "rank")
    val den = Seq((1L, 5L, 2), (1L, 7L, 1)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(lex, den, "q", "id", "rank", k0 = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(5)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq === Seq((1L, 5L, 1), (1L, 7L, 2), (2L, 9L, 1)))
  }

  // ---- Selection.classifierScore ---------------------------------------

  test("classifierScore plan: ZERO exchanges — classification at scan speed") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val plan = Selection.classifierScore(docs, "doc_id", "text", 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier scoring must be a pure projection:\n$plan")
  }

  test("classifierScore fastHash: same zero-exchange plan, same contract " +
      "columns, different model") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val fast = Selection.classifierScore(docs, "doc_id", "text", 1024,
      fastHash = true)
    assert(!fast.queryExecution.executedPlan.toString.contains("Exchange"),
      "the fast path must keep the pure-projection plan")
    val rows = fast.limit(50).collect()
    assert(rows.forall(r => r.getLong(2) >= -500L * r.getLong(1) &&
      r.getLong(2) <= 500L * r.getLong(1)), "weight bounds hold")
  }

  test("classifierScore: exact-long fold, mean arithmetic, empty docs") {
    val df = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Selection.classifierScore(df, "doc_id", "text", 1024)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // 3 tokens → 3 unigrams + 2 bigrams = 5 features
    assert(out(1L)._1 === 5L)
    assert(out(2L) === ((0L, 0L, 0.0, 0)))
    assert(out(3L)._1 === 1L)
    for ((id, (n, s, m, keep)) <- out if n > 0) {
      assert(s >= -500L * n && s <= 500L * n, s"doc $id weight bound")
      assert(m === s.toDouble / n, s"doc $id mean must be the exact division")
      assert(keep === (if (s > 0) 1 else 0))
    }
    // deterministic: a second run is bit-identical
    val again = Selection.classifierScore(df, "doc_id", "text", 1024)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(again === out)
  }

  // ---- Curation.curateV3 ------------------------------------------------

  test("curateV3: only classifier-kept, budget-selected docs chunk; " +
      "no text column is ever a shuffle key") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = graft.scale.Curation.curateV3(docs, "doc_id", "text")
    val chunked = out.select("doc_id").distinct()
      .as[Long].collect().toSet
    // every chunked doc passed the classifier gate
    val keptIds = graft.scale.Selection
      .classifierScore(docs, "doc_id", "text")
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    assert(chunked.subsetOf(keptIds),
      "a classifier-rejected doc must never reach chunking")
    assert(chunked.size < keptIds.size,
      "the 50% token budget must exclude some kept docs")
    // chunk contract holds through the composition
    val bad = out.filter(col("chunk_toks") > 32 || col("chunk_toks") < 1)
    assert(bad.isEmpty, "chunks must carry 1..chunkSize tokens")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(text") &&
      !plan.contains("hashpartitioning(clean_text"),
      s"raw or excised text must never be a shuffle key:\n$plan")
  }

  // ---- Selection.leakageSafeSplit --------------------------------------

  test("leakageSafeSplit: every cluster member shares one split; mix sane") {
    val labeled = (0L until 3000L).map(i => (i, i % 500)).toDF("id", "cid")
    val out = Selection.leakageSafeSplit(labeled, "cid", 80, 10)
    val perCluster = out.groupBy("cid")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perCluster.forall(_.getLong(1) === 1L),
      "a near-dup cluster must never straddle splits")
    val dist = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.keySet === Set("train", "val", "test"),
      s"all three splits should appear over 500 clusters: $dist")
    assert(dist("train") > dist("val") && dist("train") > dist("test"),
      s"train must dominate at 80pct: $dist")
  }

  // ---- Selection.packSequences ------------------------------------------

  test("packSequences: exact segments, docs straddle cuts, empty docs drop") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 10L), (4L, 0L))
      .toDF("doc_id", "n_tokens")
    // layout in id order: doc1 [0,5) doc2 [5,8) doc3 [8,18); seqLen 6
    val out = Selection.packSequences(df, "doc_id", "n_tokens", 6L, bins = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out === Set(
      (0L, 1L, 0L, 0L, 5L),              // doc1 fully in seq 0
      (0L, 2L, 0L, 5L, 1L),              // doc2 head fills seq 0
      (1L, 2L, 1L, 0L, 2L),              // doc2 tail opens seq 1
      (1L, 3L, 0L, 2L, 4L),              // doc3 head continues seq 1
      (2L, 3L, 4L, 0L, 6L)))             // doc3 tail is all of seq 2
  }

  test("packSequences invariants on the corpus: both reassemblies exact") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val segs = Selection.packSequences(docs, "doc_id", "n_tokens", 64L)
      .persist()
    try {
      // per doc: segments partition [0, n) — lengths sum back to n
      val badDocs = segs.groupBy("doc_id")
        .agg(sum("seg_len").as("got"), min("doc_off").as("first"))
        .join(docs.filter(col("n_tokens") > 0), Seq("doc_id"))
        .filter(col("got") =!= col("n_tokens") || col("first") =!= 0L)
        .count()
      assert(badDocs === 0L, "every doc must reassemble from its segments")
      // per sequence: exactly seqLen tokens except the single tail
      val fills = segs.groupBy("seq_id").agg(sum("seg_len").as("fill"),
        min("seq_pos").as("pos0")).collect()
      val maxSeq = fills.map(_.getLong(0)).max
      assert(fills.forall(r => r.getLong(2) === 0L),
        "every sequence must start at position 0")
      assert(fills.filter(_.getLong(0) < maxSeq).forall(_.getLong(1) === 64L),
        "every non-tail sequence must be exactly full")
    } finally { segs.unpersist(); () }
  }

  test("trainingMix: every non-tail sequence exactly full; copies of a " +
    "doc scatter across sequences; no corpus-wide single partition") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val mix = graft.scale.Curation.trainingMix(docs, "doc_id", "lang",
      "text", tau = 0.5, budgetEpochs = 2.0, seqLen = 128L).persist()
    try {
      val fills = mix.groupBy("seq_id").agg(sum("seg_len").as("fill"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tail = fills.keys.max
      assert(fills.filter(_._1 < tail).values.forall(_ === 128L),
        "every non-tail sequence must hold exactly seqLen tokens")
      // replicated docs (copy_id 1) must exist under a 2.0-epoch
      // budget, and a doc's copies must scatter via mix_hash: sharing
      // a sequence happens only by hash coincidence (~docs/seqs
      // expected), never systematically
      val multi = mix.filter(col("copy_id") >= 1)
        .select(countDistinct(col("doc_id"))).head.getLong(0)
      assert(multi > 0L, "a 2x budget must replicate some docs")
      val together = mix.groupBy("doc_id", "seq_id")
        .agg(countDistinct(col("copy_id")).as("k"))
        .filter(col("k") > 1).count()
      assert(together.toDouble / multi < 0.01,
        s"copies of one doc should scatter: $together/$multi share")
      // the corpus-scale layout window must partition by bin; the
      // tiny-frame SinglePartition moves (counts, stats, bin offsets)
      // are bounded per-operator in the packSequences/budgetSelect
      // specs — here their TEXTUAL count multiplies because the
      // pre-materialization AQE plan reprints the persisted base's
      // lineage under every consumer branch, so it carries no signal
      val plan = mix.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(__bin"),
        s"the layout window must stay bin-partitioned:\n$plan")
    } finally { mix.unpersist(); () }
  }

  test("packSequences plan: layout window partitions by bin, corpus never " +
    "funnels to one partition") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val plan = Selection.packSequences(docs, "doc_id", "n_tokens", 256L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bin"),
      s"the layout prefix window must partition by bin:\n$plan")
    // allowed SinglePartition moves are the tiny post-partial-agg frames
    // only (id-range reduce ×2 evaluation sites, ≤bins-row offset
    // window) — the doc stream itself must stay bin-partitioned
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 3, s"corpus must not funnel to one partition:\n$plan")
  }

  // ---- Selection.budgetSelectBy ------------------------------------------

  test("budgetSelectBy equals the naive per-group cumsum; budgets are " +
    "independent per group") {
    // en: budget-crossing doc taken; fr: identical SCORES as en docs
    // (cross-group isolation), last doc out
    val df = Seq(
      ("en", 1L, 0.90, 100L), ("en", 2L, 0.80, 200L),
      ("en", 3L, 0.80, 50L), ("en", 4L, 0.50, 300L),
      ("fr", 5L, 0.90, 10L), ("fr", 6L, 0.10, 400L),
      ("fr", 7L, 0.05, 500L), ("fr", 8L, 0.01, 20L)
    ).toDF("lang", "doc_id", "score", "n_tokens")
    val out = Selection.budgetSelectBy(df, "lang", "doc_id", "score",
      "n_tokens", 0.5, bins = 4)
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getInt(5))))
      .toMap
    // en: tot 650 budget 325, order 1,2,3,4 → cb 0,100,300,350
    // fr: tot 930 budget 465, order 5,6,7,8 → cb 0,10,410,910
    //     (doc 7 crosses its group's budget: taken)
    assert(out === Map(
      1L -> ((0L, 1)), 2L -> ((100L, 1)), 3L -> ((300L, 1)),
      4L -> ((350L, 0)),
      5L -> ((0L, 1)), 6L -> ((10L, 1)), 7L -> ((410L, 1)),
      8L -> ((910L, 0))))
  }

  test("budgetSelectBy plan: corpus window partitions by (group, bin), " +
    "never one partition") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("lang"), col("doc_id"),
        TextStats.stopwordRatio(col("text")).as("score"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val plan = Selection.budgetSelectBy(docs, "lang", "doc_id", "score",
      "n_tokens", 0.5).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(lang"),
      s"every window/agg must be keyed by group (+bin):\n$plan")
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single === 0,
      s"grouped form needs NO single-partition move at all:\n$plan")
  }

  // ---- Selection.curriculumOrder -----------------------------------------

  test("curriculumOrder: decomposed rank equals the naive global rank; " +
    "stages are equal-size ±1; in-stage ord is a permutation") {
    val df = (0L until 23L).map(i => (i, (i % 5).toDouble * 0.1))
      .toDF("doc_id", "score") // duplicate scores, id tiebreak
    val out = Selection.curriculumOrder(df, "doc_id", "score",
      stages = 4, bins = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))
    val expRank = (0L until 23L).map(i => (i, (i % 5).toDouble * 0.1))
      .sortBy { case (id, s) => (s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    out.foreach { case (id, _, rank, stage, _) =>
      assert(rank === expRank(id), s"doc $id rank")
      assert(stage === (rank * 4 / 23).toInt, s"doc $id stage")
    }
    val sizes = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1,
      s"stage sizes must differ by <= 1: $sizes")
    out.groupBy(_._4).foreach { case (stage, rows) =>
      assert(rows.map(_._5).sorted.toSeq === (1 to rows.length),
        s"stage $stage ord must be a 1..n permutation")
    }
  }

  test("curriculumOrder plan: rank window by bin, shuffle window by " +
    "stage — no global corpus sort") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"),
        TextStats.stopwordRatio(col("text")).as("score"))
    val plan = Selection.curriculumOrder(docs, "doc_id", "score", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bin"),
      s"the rank window must partition by bin:\n$plan")
    assert(plan.contains("hashpartitioning(stage"),
      s"the in-stage shuffle must partition by stage:\n$plan")
    // tiny frames only: the one-row stats reduce (×2 evaluation
    // sites) and the ≤bins-row offset window
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 3, s"corpus must not funnel to one partition:\n$plan")
  }
}
