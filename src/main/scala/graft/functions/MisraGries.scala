package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

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
  * `finish` returns only the candidate KEYS (sorted): the counts are
  * order-dependent approximations (merge order changes them) while the
  * surviving key set is what the two-pass pattern consumes, and the
  * exact pass recomputes trustworthy counts anyway.
  *
  * Reference analog: none — the reference's n-gram work is exact
  * per-document (news_article_sentiment.py tokenize); this is a scale
  * extension per the build brief (BASELINE.json text analysis).
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
      x: String): mutable.HashMap[String, Long] = {
    if (x != null) {
      b.get(x) match {
        case Some(c) => b.update(x, c + 1L)
        case None if b.size < capacity => b.update(x, 1L)
        case None =>
          // Classic MG step: a full sketch meets an untracked key →
          // decrement every counter, drop zeros. Each decrement-all
          // cancels capacity+1 units of total count mass, so across n
          // arrivals it runs at most n/(capacity+1) times: amortized
          // O(1) per row.
          val dead = List.newBuilder[String]
          b.keysIterator.toList.foreach { k =>
            val c = b(k) - 1L
            if (c == 0L) dead += k else b.update(k, c)
          }
          dead.result().foreach(b.remove)
      }
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // Merged-sketch shrink (Agarwal et al.): subtract the
      // (capacity+1)-th largest counter from all, keep positives —
      // preserves the MG error bound with error terms adding.
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - capacity - 1)
      val dead = List.newBuilder[String]
      a.keysIterator.toList.foreach { k =>
        val c = a(k) - thresh
        if (c <= 0L) dead += k else a.update(k, c)
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
