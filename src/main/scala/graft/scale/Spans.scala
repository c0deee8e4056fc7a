package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level corpus operators: cross-document repeated-span detection
  * (the hash-gram approximation of suffix-array substring dedup — Lee
  * et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better") and token-window chunking (training/RAG document prep).
  * Reference behavior anchor: lakehouse_v3 has no span operators; these
  * extend the curation surface the brief asks for beyond the reference.
  *
  * Scale shape (repeatedSpans): spans are overlapping `n`-token windows
  * at `stride`; each becomes one 8-byte xxhash64 — the text itself
  * never shuffles. Cross-doc duplication is min(doc) ≠ max(doc) over
  * the span-hash partition, so the global pass is ONE hash-partitioned
  * window (the q40 first-occurrence shape, not a groupBy + re-join that
  * would shuffle the span stream twice), followed by the narrow per-doc
  * aggregate. Both exchanges carry longs.
  *
  * Chunking is a pure Generate (zero shuffle): chunk starts are
  * `i · (size − overlap)` with the minimal count that still covers the
  * last token, so a 100 TB corpus chunks map-side at scan speed.
  */
object Spans {

  /** Per-document overlapping span hashes: `(idCol, __sh)` with one row
    * per span position (multiplicity kept — a span repeated inside one
    * doc emits one row per occurrence). Docs with fewer than `n` tokens
    * surface a single null `__sh` row so they survive to the report
    * with `n_spans = 0` (explode_outer; the null also stays outside
    * InferFiltersFromGenerate's match — generate hygiene, Dedup doc). */
  private def spanHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int, stride: Int): DataFrame =
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        when(size(col("__toks")) >= n,
          floor((size(col("__toks")) - n).cast("double") / stride)
            .cast("int") + 1).otherwise(0).as("__k"))
      // sequence(0, -1) yields a DESCENDING [0, -1], not empty — the
      // zero-span case must map to null (one surviving outer row)
      .select(col(idCol), explode_outer(
        when(col("__k") >= 1, transform(sequence(lit(0), col("__k") - 1),
          i => xxhash64(slice(col("__toks"), i * stride + 1, lit(n))))))
        .as("__sh0"))
      // short-doc padding rows get a PER-DOC sentinel hash instead of
      // null: nulls would all hash-partition together, a one-partition
      // skew proportional to the short-doc count at corpus scale. The
      // sentinel partitions are singletons (min = max ⇒ never dup) and
      // __real keeps them out of every count.
      .select(col(idCol), col("__sh0").isNotNull.as("__real"),
        coalesce(col("__sh0"),
          xxhash64(concat(lit("\u0000span-pad:"), col(idCol))))
          .as("__sh"))

  /** Cross-document repeated-span report: for every document,
    * `n_spans` (overlapping `n`-token windows at `stride`),
    * `dup_spans` (spans whose token content also occurs in at least
    * one OTHER document), `dup_ratio`, and `flagged` (ratio ≥
    * `flagRatio` — the "mostly boilerplate" verdict). Window-stride
    * span hashing trades exact substring bounds for linear work: a
    * shared substring of ≥ n + stride − 1 tokens is guaranteed to
    * contribute ≥ 1 aligned window on each side. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, stride: Int, flagRatio: Double = 0.5): DataFrame = {
    require(n >= 1 && stride >= 1, "span window and stride must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__sh"))
    spanHashes(df, idCol, textCol, n, stride)
      // cross-doc dup ⇔ the hash partition spans more than one doc id
      .withColumn("__dup", col("__real") &&
        (min(col(idCol)).over(w) =!= max(col(idCol)).over(w)))
      .groupBy(col(idCol))
      .agg(sum(when(col("__real"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("dup_spans"))
      .select(col(idCol), col("n_spans"), col("dup_spans"),
        round(col("dup_spans").cast("double") /
          greatest(col("n_spans"), lit(1L)).cast("double"), 6)
          .as("dup_ratio"))
      .withColumn("flagged",
        (col("dup_ratio") >= flagRatio).cast("int"))
  }

  /** Cross-document repeated-span EXCISION — where [[repeatedSpans]]
    * flags, this removes: every token covered by a duplicated span
    * window whose content first occurs in an earlier document is cut,
    * and the document is reassembled from its surviving tokens (the
    * substring-dedup transform of Lee et al. 2022 — keep one global
    * occurrence of repeated content, excise the rest). The
    * smallest-id document owning a span keeps ALL its occurrences
    * (intra-doc repetition is not cross-doc duplication — same
    * verdict as [[repeatedSpans]]); every other document loses the
    * covered tokens. Tokens past the last window (at most stride − 1
    * of them) are never covered and always survive.
    *
    * Output: `idCol, n_tokens, n_removed, clean_text` (clean text is
    * the surviving tokens joined by single spaces — normalized form,
    * like [[chunk]]'s `chunk_text`). Zero-token documents survive
    * with empty text.
    *
    * Scale shape: the loser-window pass is [[repeatedSpans]]'s single
    * span-hash window (8-byte keys); removed positions fold to ONE
    * int array per losing document (collect_set over an (id)-keyed
    * aggregate — bounded by that doc's token count however heavy the
    * boilerplate), and the rebuild is a single left join of that
    * narrow frame onto the tokenized docs followed by a pure
    * `array_except` projection. The corpus text crosses the wire AT
    * MOST once (the join's doc side when AQE picks a shuffled join;
    * zero times when the loser frame broadcasts) and never as a
    * shuffle KEY. The first form of this operator posexploded every
    * token into its own row and reassembled through a
    * collect_list aggregate — per-TOKEN row overhead that cannot
    * amortize with document size: the honest KB-doc audit measured it
    * at 15× compressed source with 6.5 GB of spill inside a 48 GB
    * heap, vs ~1× + narrow marks for this form. Nothing is quadratic:
    * a fully-boilerplate corpus costs n ints per loser window,
    * linear in corpus size. */
  def exciseRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, stride: Int): DataFrame = {
    require(n >= 1 && stride >= 1, "span window and stride must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__sh"))
    // loser occurrences: the span content exists in a smaller-id doc.
    // collect_set dedups the overlapping-window positions, so the
    // explode+aggregate is ONE narrow (id)-keyed exchange of ints.
    val removed = spanStarts(df, idCol, textCol, n, stride)
      .withColumn("__windoc", min(col(idCol)).over(w))
      .filter(col(idCol) =!= col("__windoc"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + (n - 1)))
          .as("__rm"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__rm")).as("__rms"))
    // rebuild as a projection: surviving positions = positions \ __rms
    // (array_except is hash-set based and keeps first-array order, and
    // positions are distinct ascending — no sort, no per-token rows).
    // A doc with loser windows has >= n tokens, so sequence(0, size-1)
    // never hits the descending-sequence footgun; docs without an
    // __rms row (no losers, short, empty, null text) take the
    // untouched-text branch.
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .join(removed.withColumnRenamed(idCol, "__rid"),
        col(idCol) === col("__rid"), "left")
      .select(col(idCol),
        coalesce(size(col("__toks")).cast("long"), lit(0L)).as("n_tokens"),
        coalesce(size(col("__rms")).cast("long"), lit(0L)).as("n_removed"),
        when(col("__rms").isNull, concat_ws(" ", col("__toks")))
          .otherwise(array_join(transform(
            array_except(sequence(lit(0), size(col("__toks")) - 1),
              col("__rms")),
            i => element_at(col("__toks"), i + 1)), " "))
          .as("clean_text"))
  }

  /** Span rows with their 0-based start positions:
    * `(idCol, __start, __sh)` — [[spanHashes]] plus position, minus
    * the short-doc sentinel rows (excision has nothing to cut in a
    * doc with no windows, so they would be dead weight here). */
  private def spanStarts(df: DataFrame, idCol: String, textCol: String,
      n: Int, stride: Int): DataFrame =
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        when(size(col("__toks")) >= n,
          floor((size(col("__toks")) - n).cast("double") / stride)
            .cast("int") + 1).otherwise(0).as("__k"))
      .select(col(idCol), explode_outer(
        when(col("__k") >= 1, transform(sequence(lit(0), col("__k") - 1),
          i => struct((i * stride).as("__start"),
            xxhash64(slice(col("__toks"), i * stride + 1, lit(n)))
              .as("__sh"))))).as("__s"))
      .filter(col("__s").isNotNull) // generate hygiene — Dedup doc
      .select(col(idCol), col("__s.__start").as("__start"),
        col("__s.__sh").as("__sh"))

  /** Token-window chunking: each document becomes ⌈(len − overlap) /
    * (chunkSize − overlap)⌉ chunks of ≤ `chunkSize` tokens, consecutive
    * chunks sharing `overlap` tokens; the chunk count is minimal under
    * full coverage (the last chunk always reaches the final token).
    * Output: `idCol, chunk_id, chunk_toks, chunk_text`. Documents
    * without tokens produce no chunks (chunking's contract is over
    * token content). Pure projection + Generate — no shuffle. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize >= 1 and 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")))
      // minimal covering count: 1 + ceil((len - chunkSize) / stride)
      // via integer arithmetic (exactly replayable in the oracle)
      .withColumn("__k",
        when(col("__len") <= chunkSize,
          when(col("__len") >= 1, 1).otherwise(0))
          .otherwise(((col("__len") - chunkSize + stride - 1) / stride)
            .cast("int") + 1))
      .select(col(idCol), col("__toks"),
        // sequence(0, -1) is a descending [0, -1], not empty — guard
        explode_outer(when(col("__k") >= 1,
          sequence(lit(0), col("__k") - 1))).as("chunk_id"))
      .filter(col("chunk_id").isNotNull) // generate hygiene — Dedup doc
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("chunk_toks"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }
}
