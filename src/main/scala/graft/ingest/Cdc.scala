package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply — reconcile an insert/update/delete change stream into a
  * base snapshot (the lakehouse MERGE-with-deletes shape; the
  * reference's MERGE upserts are the U/I subset of this).
  *
  * Per key, only the LATEST change (by `seqCol`, tie-broken
  * deterministically) wins: D drops the key, I/U replaces the row.
  * Untouched base rows pass through.
  *
  * Scale shape: one window over the CHANGE stream only (changes ≪
  * base), one anti join of base against the touched-key set (AQE
  * broadcasts it when small), one union. The base table is never
  * shuffled. */
object Cdc {

  /** @param changes must contain `keys`, `opCol` ('I'|'U'|'D'), `seqCol`,
    *                and the base's data columns (values for I/U rows).
    */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val touched = latest.select(keys.map(col): _*)
    val upserts = latest.filter(col(opCol) =!= "D")
      .drop(opCol, seqCol)
    base.join(touched, keys, "left_anti")
      .unionByName(upserts)
  }
}
