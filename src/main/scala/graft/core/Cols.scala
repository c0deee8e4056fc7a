package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Column-level utilities shared across the engine.
  *
  * Re-expresses the reference's header/naming hygiene and dirty-cast
  * semantics (SURVEY §2.2): P1 rename-all (uber/csv_to_delta.py:38-42),
  * P2 reorder-front (csv_to_delta.py:81-83), P4 null-normalizing cast
  * (csv_to_delta.py:45-52), P11 backtick-safe refs
  * (coin/coin_bronze2_to_silver.py:98-100).
  */
object Cols {

  /** P1: sanitize header names — spaces/parens/percent → underscores.
    * Matches the reference's CSV-header cleanup. */
  def sanitizeName(c: String): String =
    c.trim
      .replace(" ", "_").replace("(", "").replace(")", "")
      .replace("%", "pct").replace(".", "_").replace("-", "_")

  def sanitizeNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)

  /** P11: reference a column whose *name* contains dots (JSON-normalize
    * artifacts like `quote.usd.price`) without struct-field parsing. */
  def safeCol(name: String): Column =
    col(if (name.contains(".")) s"`$name`" else name)

  /** P2: move key columns to the front, keep the rest in order. */
  def reorderFront(df: DataFrame, front: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(front.contains)
    df.select((front ++ rest).map(safeCol).toIndexedSeq: _*)
  }

  /** P4: dirty-null normalization + cast. String cells holding literal
    * "null"/"none"/"nan"/blank become real NULLs before the cast (the
    * cast itself would throw under ANSI mode otherwise). */
  def nullNormalizedCast(c: Column, to: DataType): Column =
    when(lower(trim(c)).isin("null", "none", "nan", ""), lit(null))
      .otherwise(c)
      .cast(to)
}
