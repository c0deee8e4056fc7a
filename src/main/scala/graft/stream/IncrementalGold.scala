package graft.stream

import graft.ingest.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental gold-aggregate maintenance: the streaming form of a
  * materialized view over decomposable aggregates (counts and sums).
  *
  * Each micro-batch is reduced to a PARTIAL aggregate per key by the
  * caller-supplied `partial`, then merged into the stored table by
  * union + re-aggregation — the same partial/final split Spark's own
  * HashAggregate performs across a shuffle, lifted across micro-batches.
  * Because count and sum are associative+commutative, the maintained
  * table equals the batch aggregate over all data seen so far,
  * regardless of how the backlog was chunked into batches.
  *
  * At 100 TB this is the pattern that replaces "re-aggregate the whole
  * fact table nightly": per-batch work is O(batch), the merge is
  * O(|gold|) — keyed by low-cardinality dims, so |gold| stays tiny.
  * (Re-expresses the reference's gold KPI jobs — e.g.
  * spark/jobs/uber/gold.py — as a streaming-maintained table.)
  */
object IncrementalGold {

  /** Drain `sourceDir` (AvailableNow + checkpoint = each file exactly
    * once) maintaining `table`. `partial` must map a batch to one row
    * per key: `keys ++ decomposable partial-agg columns` (all numeric,
    * sum-mergeable). Blocks until the backlog is drained.
    *
    * Replay-safe: foreachBatch side effects are at-least-once (a crash
    * between the table write and the checkpoint commit replays the
    * batch), so the applied batch id rides the gold write itself as a
    * constant column — guard and merge are one atomic write, and a
    * replayed batch is skipped instead of double-counted.
    */
  private val BatchCol = "__applied_batch"

  /** Read the maintained gold table without the internal batch-id
    * bookkeeping column. */
  def read(spark: SparkSession, io: TableIO, table: String): DataFrame =
    io.read(spark, table).drop(BatchCol)

  def run(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpointDir: String, io: TableIO, table: String,
      keys: Seq[String], maxFilesPerTrigger: Option[Int] = None)(
      partial: DataFrame => DataFrame): Unit = {
    // maxFilesPerTrigger bounds per-batch work (AvailableNow chunks the
    // backlog instead of draining it in one giant batch) — the knob
    // that keeps a month-long backfill from needing a month of memory
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toLong))
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val existing =
          if (io.exists(spark, table)) Some(io.read(spark, table)) else None
        val applied = existing
          .map(_.select(max(col(BatchCol))).first().getLong(0))
          .getOrElse(-1L)
        if (batchId > applied && !batch.isEmpty) {
          val p = partial(batch)
          val merged = existing match {
            case Some(g) => g.drop(BatchCol).unionByName(p)
            case None => p
          }
          val aggCols = p.columns.filterNot(keys.contains)
            .map(c => sum(col(c)).as(c))
          io.overwrite(
            merged.groupBy(keys.map(col): _*)
              .agg(aggCols.head, aggCols.tail: _*)
              .withColumn(BatchCol, lit(batchId)),
            table)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
