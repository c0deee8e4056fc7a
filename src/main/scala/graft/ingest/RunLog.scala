package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental-run bookkeeping — the reference's `_control`/
  * `ckpt` tables as one utility: last-object-key checkpoints
  * (coin/convert_to_delta.py:38-59), run logs with processed_max_ts
  * (alphavantage/bronze2_to_silver.py:45-61,210-223), processed-file
  * logs for the anti-join discovery (transform_into_delta.py:48-65).
  *
  * All reads are O1-shaped (orderBy desc limit 1 → TakeOrderedAndProject)
  * or bounded-log scans; appends are single small files — control-plane
  * I/O stays metadata-scale regardless of data volume.
  */
final class RunLog(io: TableIO, table: String) {

  /** Record a completed run. `watermark` is the max key/ts processed. */
  def record(spark: SparkSession, runId: String, watermark: String,
      nRows: Long, status: String = "ok"): Unit = {
    import spark.implicits._
    io.append(
      Seq((runId, watermark, nRows, status))
        .toDF("run_id", "watermark", "n_rows", "status")
        .withColumn("run_at", current_timestamp()),
      table)
  }

  /** Latest successful watermark, None before the first run. */
  def lastWatermark(spark: SparkSession): Option[String] =
    if (!io.exists(spark, table)) None
    else io.read(spark, table)
      .filter(col("status") === "ok")
      .orderBy(col("run_at").desc, col("watermark").desc)
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[String]("watermark"))

  /** Processed-file log append + the anti-join discovery
    * (IncrementalSource.newFiles against this log). */
  def markFiles(spark: SparkSession, paths: Seq[String]): Unit = {
    import spark.implicits._
    if (paths.nonEmpty)
      io.append(paths.toDF("path")
        .withColumn("processed_at", current_timestamp()), s"${table}_files")
  }

  def unprocessed(spark: SparkSession, files: DataFrame): DataFrame =
    if (!io.exists(spark, s"${table}_files")) files
    else IncrementalSource.newFiles(files,
      io.read(spark, s"${table}_files"))
}
