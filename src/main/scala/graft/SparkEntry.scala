package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query
  * in [[registry]]; `queries` + `oracleSql` are derived views of it.
  */
object SparkEntry {

  /** All registered queries, grouped by area. */
  def registry: Seq[QueryDef] =
    GoldQueries.all ++ CleanQueries.all ++ JoinQueries.all ++
      AggQueries.all ++ WindowQueries.all ++ FunctionQueries.all ++
      DqQueries.all ++ IngestQueries.all ++ StreamQueries.all ++
      ScaleQueries.all ++ SqlQueries.all ++ DomainQueries.all ++
      OlapQueries.all ++ CorpusQueries.all ++ SqlSurfaceQueries.all ++
      VersionedQueries.all ++ SelectionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GoldQueries.q1Kpi.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o())).toMap
}
