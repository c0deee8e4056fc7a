package graft.scale

import graft.functions.MisraGries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact corpus-wide top-k n-grams via the two-pass heavy-hitters
  * pattern:
  *
  *   pass 1 — Misra-Gries sketch ([[graft.functions.MisraGries]]):
  *     one scan, bounded memory (≤ capacity counters per partial
  *     buffer, associative merge), yields ≤ capacity CANDIDATE grams,
  *     a saturation flag, and the total gram count N in one aggregate.
  *     Guarantee: every gram with count > N/(capacity+1) is a
  *     candidate, so the true top-k is contained whenever the k-th
  *     most frequent gram clears that bar (k ≪ capacity in practice).
  *   pass 2 — exact recount of candidates only: broadcast-join the
  *     gram stream against the ≤ capacity candidate keys, GROUP BY
  *     gram, take top-k by (count desc, gram asc).
  *
  * The result carries EXACT counts and is deterministic — oracle = a
  * plain GROUP BY top-k — while never shuffling more than `capacity`
  * distinct keys. The naive one-pass exact GROUP BY over a 100 TB
  * corpus shuffles every distinct n-gram (billions); this shuffles the
  * per-partition sketches (pass 1, O(partitions × capacity)) plus at
  * most `capacity` keys (pass 2). Two scans of the gram stream is the
  * standard price; feed a cached/columnar source when iterating.
  *
  * DETERMINISM REQUIREMENT: the exactness proof binds only if the
  * source yields the SAME rows on both scans — the containment bar
  * from pass 1 is applied to pass 2's recount. Static tables (parquet
  * scans, the engine's versioned snapshots) satisfy this by
  * construction; a nondeterministic or sampled input (rand() filters,
  * unseeded sampling, a live stream) must be persisted/checkpointed
  * UPSTREAM before calling in, or the gate silently certifies counts
  * from a different corpus than the sketch saw.
  *
  * The driver-side `first()` pulls one row of ≤ capacity strings —
  * bounded by construction, same discipline as the k×dim centroid
  * collect in [[KMeans]].
  */
object HeavyHitters {

  /** Top-k word bigrams of `textCol` with exact counts: (gram, n).
    *
    * Exactness proof, per the sketch's saturation flag:
    *   - UNSATURATED (no eviction ever fired): the sketch is a
    *     complete frequency table — the recounted top-k is exact with
    *     no further conditions (fewer than k rows just means fewer
    *     than k distinct grams exist).
    *   - SATURATED: the run fails fast unless (a) at least k
    *     candidates survived and (b) the k-th recounted count strictly
    *     clears the MG containment bar N/(capacity+1) — otherwise a
    *     non-candidate gram (count ≤ bar by the MG bound) could belong
    *     in the top-k and the result would be plausible but unproven.
    *
    * @param capacity MG sketch size; must comfortably exceed k. */
  def topGrams(docs: DataFrame, textCol: String, k: Int,
      capacity: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Tokenize in its OWN projection: inlining tokens() into the
    // bigram lambda would re-run the regex split per element_at — the
    // projection boundary keeps it once per document (q83's pattern;
    // CollapseProject declines to merge a multiply-referenced alias).
    val grams = docs
      .select(TextStats.tokens(col(textCol)).as("__toks"))
      .select(explode_outer(TextStats.bigramsFromTokens(col("__toks")))
        .as("gram"))
      .filter(col("gram").isNotNull) // generate hygiene — Dedup class doc
    val mg = udaf(new MisraGries(capacity))
    // Pass 1: sketch + total count in one aggregate → one driver row
    // of ≤ capacity strings, a flag and a long (bounded by construction).
    val sk = grams
      .agg(mg(col("gram")).as("sketch"), count(lit(1)).as("n_total"))
      .select(col("sketch.keys"), col("sketch.saturated"), col("n_total"))
      .first()
    val candKeys = sk.getSeq[String](0)
    val saturated = sk.getBoolean(1)
    val bar = sk.getLong(2).toDouble / (capacity + 1).toDouble
    if (saturated) require(candKeys.size >= k,
      s"top-$k not provably exact: saturated sketch kept only " +
        s"${candKeys.size} candidates — raise capacity=$capacity")
    // Pass 2: exact recount restricted to the candidate set.
    val top = grams.join(broadcast(candKeys.toDF("gram")), Seq("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
    if (!saturated) top
    else
      // Clearance gate on the k result rows; the filter keeps the
      // assertion in the plan (assert_true yields NULL when it passes).
      top.filter(assert_true(col("n").cast("double") > lit(bar),
        lit(s"top-$k not provably exact: raise capacity=$capacity")).isNull)
  }

  /** GROUPED top-k bigrams — (groupCol, gram, n, rank ≤ k) with exact
    * counts per group, e.g. per-language vocabulary heads.
    *
    * Unlike [[topGrams]] nothing touches the driver: one MG sketch per
    * group merges behind a partial ObjectHashAggregate, the candidate
    * keys explode back into a (group, gram) BROADCAST join against the
    * gram stream (the candidate side is ≤ groups × capacity rows by
    * construction, so the full gram stream never shuffles for the
    * recount — only the post-join per-candidate partial counts do), and
    * the
    * per-group top-k is a rank window. The exactness proof is the
    * per-ROW form of topGrams' gate, evaluated in-plan per group:
    * unsaturated groups are complete exact tables; saturated groups
    * must keep ≥ k candidates AND clear their own N_g/(capacity+1)
    * bar on every returned row, else the query fails fast. */
  def topGramsByGroup(docs: DataFrame, groupCol: String, textCol: String,
      k: Int, capacity: Int): DataFrame = {
    val mg = udaf(new MisraGries(capacity))
    val grams = docs
      .select(col(groupCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(groupCol),
        explode_outer(TextStats.bigramsFromTokens(col("__toks"))).as("gram"))
      .filter(col("gram").isNotNull) // generate hygiene — Dedup class doc
    val sketches = grams.groupBy(col(groupCol))
      .agg(mg(col("gram")).as("__sk"), count(lit(1)).as("__ng"))
      .select(col(groupCol), col("__sk.keys").as("__keys"),
        col("__sk.saturated").as("__sat"),
        (col("__ng").cast("double") / (capacity + 1).toDouble).as("__bar"),
        size(col("__sk.keys")).as("__ncand"))
      // candidate-count gate HERE, on the one-row-per-group frame: a
      // saturated sketch can end with fewer candidates than k (even
      // zero, when every counter cancels) — the row-level gate below
      // never sees groups whose candidates vanished, so this is the
      // only place the check is airtight
      .filter(assert_true(!col("__sat") || col("__ncand") >= k,
        concat(lit(s"top-$k not provably exact for group "), col(groupCol),
          lit(s": raise capacity=$capacity"))).isNull)
    val cands = sketches.select(col(groupCol).as("__g"), col("__sat"),
      col("__bar"), explode(col("__keys")).as("gram"))
    // null-safe group match: an equi-join would silently drop a NULL
    // group key that the sketch aggregate (and the oracle's GROUP BY)
    // kept. Broadcast: cands is ≤ groups × capacity rows by
    // construction, so the gram stream stays un-shuffled.
    val exact = grams.join(broadcast(cands),
        col(groupCol) <=> col("__g") && grams("gram") === cands("gram"))
      .select(grams(groupCol), grams("gram"), col("__sat"), col("__bar"))
      .groupBy(col(groupCol), col("gram"))
      .agg(count(lit(1)).as("n"), first(col("__sat")).as("__sat"),
        first(col("__bar")).as("__bar"))
    val ranked = exact
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("n").desc, col("gram").asc)))
      .filter(col("rank") <= k)
    ranked.filter(assert_true(
        !col("__sat") || col("n").cast("double") > col("__bar"),
        concat(lit(s"top-$k not provably exact for group "), col(groupCol),
          lit(s": raise capacity=$capacity"))).isNull)
      .select(col(groupCol), col("gram"), col("n"), col("rank"))
  }
}
