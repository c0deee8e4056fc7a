package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the unit of the driver's
  * correctness gate. `fn` builds the DataFrame against the parquet tables
  * under `sfDir`; `oracle` is the equivalent DuckDB ANSI SQL over the
  * same tables (None for non-SQL-expressible ops → rows-only check).
  * The oracle is a THUNK, evaluated when the SQL is dumped — Verify
  * runs the queries first, so an oracle may be derived from artifacts
  * the query run produced (q140 reads the exported snapshot manifest's
  * file list, proving a foreign engine consumes the export). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[() => String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(() => oracle))

  /** Oracle SQL computed at dump time (after the queries ran). */
  def dynamicOracle(name: String)(oracle: => String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(() => oracle))

  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
