package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the unit of the driver's
  * correctness gate. `fn` builds the DataFrame against the parquet tables
  * under `sfDir`; `oracle` is the equivalent DuckDB ANSI SQL over the
  * same tables (None for non-SQL-expressible ops → rows-only check). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
