package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second custom-operator case the
  * engine composes from built-ins (alongside [[AsOf]]).
  *
  * A naive `p.ts BETWEEN i.start AND i.end` theta join has no equi-key:
  * Spark plans BroadcastNestedLoopJoin — O(|points|·|intervals|), a
  * non-starter at 100 TB. Bucketing restores an equi-key: points hash
  * to their time bucket; each interval explodes to the buckets it
  * overlaps (bounded by interval length / bucketWidth); the equi-join
  * on bucket + residual BETWEEN filter is exact. Choose `bucketWidth`
  * ≈ the typical interval length so the explode factor stays small.
  */
object RangeJoin {

  /** Join each point row to every interval row containing it
    * (start <= pt < end). Timestamps are compared as epoch seconds;
    * `bucketWidth` is in seconds. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // micros precision: unix_timestamp() truncates to seconds, which
    // under-covers intervals with fractional-second ends (the -1
    // adjustment would drop valid matches past the last whole second)
    val w = bucketWidth * 1000000L
    val ptBucket = floor(unix_micros(col(ptCol)) / w)
    val startBucket = floor(unix_micros(col(startCol)) / w)
    // end is exclusive; an interval touching a bucket's start occupies it
    val endBucket = floor((unix_micros(col(endCol)) - 1) / w)

    val p = points.withColumn("__bucket", ptBucket)
    val i = intervals.withColumn("__bucket",
      explode(sequence(startBucket, greatest(endBucket, startBucket))))

    p.join(i, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
