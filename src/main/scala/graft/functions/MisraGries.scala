package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Mutable Misra-Gries buffer: the counter map plus a `saturated` flag
  * recording whether ANY eviction (reduce decrement-all or merge
  * shrink) ever happened on any lineage that merged into this buffer.
  * An unsaturated final sketch therefore holds EVERY distinct input
  * with its EXACT count — the consumer can skip approximation-bound
  * checks entirely in that case. */
final class MgBuf(val counts: mutable.HashMap[String, Long],
    var saturated: Boolean) extends Serializable

/** Final sketch: surviving keys (sorted) + the saturation flag. */
final case class MgSketch(keys: Seq[String], saturated: Boolean)

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator`: bounded
  * memory (≤ `capacity` counters per partial buffer) with an
  * associative merge, so map-side combine / final-merge is safe on any
  * partitioning — the property that makes a frequency sketch usable
  * over a 100 TB token stream where an exact global GROUP BY gram
  * would shuffle billions of distinct keys.
  *
  * Guarantee (standard MG bound): every item with true count
  * > N / (capacity + 1) survives in the final sketch, and each kept
  * counter underestimates its true count by at most N / (capacity + 1).
  * The sketch is therefore a CANDIDATE set, not an exact answer — the
  * production pattern is two passes (see
  * [[graft.scale.HeavyHitters.topGrams]]): sketch → broadcast the
  * ≤ capacity candidate keys → exact recount of candidates only. The
  * second pass shuffles at most `capacity` distinct keys regardless of
  * corpus size.
  *
  * `finish` returns the candidate KEYS (sorted) + the saturation flag:
  * counter values are order-dependent approximations (merge order
  * changes them) while the surviving key set is what the two-pass
  * pattern consumes, and the exact pass recomputes trustworthy counts
  * anyway. `saturated = false` certifies the sketch is a complete
  * exact frequency table (no eviction ever fired).
  *
  * Reference analog: none — the reference's n-gram work is exact
  * per-document (news_article_sentiment.py tokenize); this is a scale
  * extension per the build brief (BASELINE.json text analysis).
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, MgBuf, MgSketch] {
  require(capacity > 0, "capacity must be positive")

  override def zero: MgBuf = new MgBuf(mutable.HashMap.empty, false)

  override def reduce(b: MgBuf, x: String): MgBuf = {
    if (x != null) {
      val m = b.counts
      m.get(x) match {
        case Some(c) => m.update(x, c + 1L)
        case None if m.size < capacity => m.update(x, 1L)
        case None =>
          // Classic MG step: a full sketch meets an untracked key →
          // decrement every counter, drop zeros. Each decrement-all
          // cancels capacity+1 units of total count mass, so across n
          // arrivals it runs at most n/(capacity+1) times: amortized
          // O(1) per row.
          b.saturated = true
          val dead = List.newBuilder[String]
          m.keysIterator.toList.foreach { k =>
            val c = m(k) - 1L
            if (c == 0L) dead += k else m.update(k, c)
          }
          dead.result().foreach(m.remove)
      }
    }
    b
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val m = a.counts
    b.counts.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
    a.saturated = a.saturated || b.saturated
    if (m.size > capacity) {
      // Merged-sketch shrink (Agarwal et al.): subtract the
      // (capacity+1)-th largest counter from all, keep positives —
      // preserves the MG error bound with error terms adding.
      a.saturated = true
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - capacity - 1)
      val dead = List.newBuilder[String]
      m.keysIterator.toList.foreach { k =>
        val c = m(k) - thresh
        if (c <= 0L) dead += k else m.update(k, c)
      }
      dead.result().foreach(m.remove)
    }
    a
  }

  override def finish(b: MgBuf): MgSketch =
    MgSketch(b.counts.keys.toSeq.sorted, b.saturated)

  override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
  override def outputEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
}
