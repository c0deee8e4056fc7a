package graft.pipeline

import graft.clean.Cleaning
import graft.core.Cols
import graft.ingest.{ParquetTableIO, TableIO}
import graft.stream.StreamIngest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The reference's medallion pipeline (bronze1 → bronze2 → silver →
  * gold, README.md:6, uber_dag.py:19) as a configurable library
  * component instead of four hand-written job scripts.
  *
  * Each stage is the reference's operator chain, re-expressed:
  *  - bronze: streamed file ingest, exactly-once checkpointing,
  *    surrogate ids continuing from the table max (csv_to_delta.py).
  *  - silver: header sanitization, dirty-null casts, latest-wins dedup,
  *    mean/mode imputation, derived features (bronze2_to_silver.py).
  *  - gold: grouped KPI aggregation with caller-supplied measures
  *    (silver_to_gold.py).
  *
  * Incremental contract: bronze re-runs are no-ops on seen files
  * (checkpoint), silver/gold are deterministic overwrites of their
  * inputs — rerunning the whole pipeline converges (MedallionSpec).
  */
final case class MedallionConfig(
    domain: String,
    sourceDir: String,
    checkpointDir: String,
    schema: Option[StructType] = None,
    naturalKey: Seq[String],
    casts: Map[String, DataType] = Map.empty,
    imputeMeanCols: Seq[String] = Nil,
    imputeModeCols: Seq[String] = Nil,
    derived: Map[String, DataFrame => Column] = Map.empty,
    goldKeys: Seq[String] = Nil,
    goldMeasures: Seq[Column] = Nil)

class Medallion(spark: SparkSession, io: TableIO, cfg: MedallionConfig) {
  private val bronzeTable = s"bronze2_${cfg.domain}"
  private val silverTable = s"silver_${cfg.domain}"
  private val goldTable = s"gold_${cfg.domain}"

  /** Metrics of the latest silver run (row count before write),
    * observed on the write job itself — no audit re-scan
    * (core.Metrics). */
  @volatile var lastSilverMetrics: Map[String, Any] = Map.empty

  def runBronze(): DataFrame = {
    StreamIngest.ingestCsv(spark, cfg.sourceDir, cfg.checkpointDir, io,
      bronzeTable, "cd_bronze_id", cfg.naturalKey, cfg.schema)
    io.read(spark, bronzeTable)
  }

  def runSilver(): DataFrame = {
    val sane = Cols.sanitizeNames(io.read(spark, bronzeTable))
    val cast = cfg.casts.foldLeft(sane) { case (df, (c, t)) =>
      df.withColumn(c, Cols.nullNormalizedCast(col(c), t))
    }
    val keyCols = cfg.naturalKey.map(Cols.sanitizeName)
    val deduped = Cleaning.dedupLatestWins(cast, keyCols,
      Seq(col("cd_bronze_id").desc))
    val imputed0 = cfg.imputeMeanCols.foldLeft(deduped)(Cleaning.imputeMean(_, _))
    val imputed = cfg.imputeModeCols.foldLeft(imputed0)(Cleaning.imputeMode(_, _))
    val withDerived = cfg.derived.foldLeft(imputed) { case (df, (name, f)) =>
      df.withColumn(name, f(df))
    }
    val silver = Cols.reorderFront(
      withDerived.withColumn("dt_record_to_silver", current_timestamp()),
      Seq("cd_bronze_id"))
    val (observed, obs) = graft.core.Metrics.observed(silver,
      s"silver_${cfg.domain}_${System.nanoTime()}",
      "rows" -> count(lit(1)))
    io.overwrite(observed, silverTable)
    lastSilverMetrics = obs.get
    io.read(spark, silverTable)
  }

  def runGold(): DataFrame = {
    require(cfg.goldKeys.nonEmpty && cfg.goldMeasures.nonEmpty,
      "gold stage needs keys and measures")
    val gold = io.read(spark, silverTable)
      .groupBy(cfg.goldKeys.map(col): _*)
      .agg(cfg.goldMeasures.head, cfg.goldMeasures.tail: _*)
    io.overwrite(gold, goldTable)
    io.read(spark, goldTable)
  }

  /** Full pipeline; returns the gold table. */
  def run(): DataFrame = { runBronze(); runSilver(); runGold() }
}
