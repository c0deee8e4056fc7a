package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Bounded-memory "smallest N, sorted" string sample — the 100 TB
  * replacement for `slice(sort_array(collect_list(x)), 1, n)`, whose
  * buffer is unbounded before the slice (SURVEY §4 anti-pattern 3; the
  * reference caps post-hoc at 002_...py:161-165).
  *
  * The buffer is a bounded max-heap: inserting past capacity evicts the
  * largest, so memory is O(cap) per group on every executor and in
  * every partial-merge, regardless of group size. Output is ascending —
  * identical to the sort_array+slice form, so oracles don't change.
  */
class CappedSortedSample(cap: Int)
    extends Aggregator[String, mutable.PriorityQueue[String], Seq[String]] {

  def zero: mutable.PriorityQueue[String] =
    mutable.PriorityQueue.empty[String](Ordering[String]) // max-heap

  private def add(q: mutable.PriorityQueue[String], v: String) = {
    if (v != null) {
      if (q.size < cap) q.enqueue(v)
      else if (Ordering[String].lt(v, q.head)) { q.dequeue(); q.enqueue(v) }
    }
    q
  }

  def reduce(q: mutable.PriorityQueue[String], v: String) = add(q, v)

  def merge(a: mutable.PriorityQueue[String],
      b: mutable.PriorityQueue[String]) = {
    b.foreach(v => add(a, v)); a
  }

  def finish(q: mutable.PriorityQueue[String]): Seq[String] =
    q.toSeq.sorted

  def bufferEncoder: Encoder[mutable.PriorityQueue[String]] =
    Encoders.kryo[mutable.PriorityQueue[String]]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object CappedSample {
  /** smallest-`cap` sorted sample of `c` (nulls ignored). */
  def cappedSample(c: Column, cap: Int): Column =
    udaf(new CappedSortedSample(cap)).apply(c)
}
