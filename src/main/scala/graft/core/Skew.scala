package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (SURVEY §7 risk 6).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the deterministic fallback when one hot key dominates (e.g. a null
  * bucket or a celebrity user). The skewed (large) side gets a random
  * salt in [0, buckets); the small side is replicated `buckets` times;
  * the join key becomes (key, salt) so the hot key spreads over
  * `buckets` reducers. Replication multiplies the small side's shuffle
  * volume — use only when a profiled hot key justifies it.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
