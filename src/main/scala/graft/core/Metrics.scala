package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Zero-cost pipeline metrics via `Dataset.observe`.
  *
  * At 100 TB the usual `df.count()` audit is an extra full scan (and
  * with lazy plans, often a full recompute). `observe` metrics ride
  * the job that was going to run anyway: aggregates are folded into
  * the existing stages and surfaced through the query-execution
  * listener when the next action fires. Use for row counts, null
  * counts, and bounds checks on every pipeline stage.
  */
object Metrics {

  /** Attach named aggregate metrics to `df`. The returned
    * [[Observation]]'s `get` blocks until the next action on the
    * returned frame and yields the metric map. At least one metric is
    * required (enforced by the signature). */
  def observed(df: DataFrame, name: String, first: (String, Column),
      rest: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val cols = (first +: rest).map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
