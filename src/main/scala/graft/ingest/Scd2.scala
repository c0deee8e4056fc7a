package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build from a change history —
  * the lakehouse dimension-maintenance op that MERGE-style upserts
  * (TableIO.merge) feed at scale.
  *
  * Input: one row per observed (key, attribute, ts) change event.
  * Output: collapsed [valid_from, valid_to) intervals per key — runs of
  * consecutive identical attribute values become one row; the open
  * interval (valid_to NULL) is flagged is_current.
  *
  * Scale shape: two window passes over the SAME (key × order) sort —
  * Catalyst reuses one shuffle+sort for both, so the build costs a
  * single exchange of the change stream regardless of history depth. */
object Scd2 {

  /** @param tieCol unique tiebreak so equal-timestamp changes order
    *               deterministically (required for exactly-reproducible
    *               dimensions across engines/runs). */
  def build(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // keep only rows where the attribute actually changed; null-safe
      // so a transition to/from a NULL attribute is a real change (a
      // plain =!= returns NULL there and silently drops the row)
      .filter(!(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
