package graft.stream

import graft.ingest.VersionedTableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming CDC APPLY: drain a keyed change stream into a versioned
  * table as ONE deletion-vector MERGE per micro-batch — the
  * production "apply the replication feed to the lakehouse" loop
  * (the reference's control-table ingest contract,
  * coin/convert_to_delta.py:38-59, upgraded from append-only to
  * keyed upsert).
  *
  * Per batch: latest-wins within the batch by `seqCol` (a CDC batch
  * can carry several changes for one key; `seqCol` must be unique per
  * key within a batch — the usual CDC log-sequence-number contract —
  * or the winner is nondeterministic, [[graft.clean.Cleaning
  * .dedupLatestWins]]'s standing caveat), then
  * [[VersionedTableIO.upsertVectors]] — O(batch + matched positions),
  * never a table rewrite. The first non-empty batch creates the table.
  *
  * Exactly-once WITHOUT a txn watermark: merge is idempotent by
  * algebra — replaying a batch masks exactly the images the first
  * application appended (same keys) and appends identical rows, so
  * the CONTENT converges no matter how the checkpoint replays or the
  * stream is re-chunked (the q147 argument; version HISTORY may
  * differ, content cannot). StreamingSpec asserts a full
  * fresh-checkpoint replay lands bit-identical content.
  *
  * At 100 TB: per-batch cost is the batch; the masked-position
  * sidecars accumulate until the normal OPTIMIZE/compaction cycle
  * ([[VersionedTableIO.compactSmall]]) materializes them — the same
  * rhythm Delta deployments run.
  */
object StreamCdcApply {

  def run(spark: SparkSession, sourceDir: String, checkpointDir: String,
      io: VersionedTableIO, table: String, keys: Seq[String],
      seqCol: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = maxFilesPerTrigger
      .foldLeft(spark.readStream)((r, m) => r.option("maxFilesPerTrigger", m))
      .schema(schema)
    val q = reader.parquet(sourceDir).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val latest = graft.clean.Cleaning
            .dedupLatestWins(batch, keys, Seq(col(seqCol).desc))
            .drop(seqCol)
          if (!io.exists(spark, table)) io.append(latest, table)
          else io.upsertVectors(spark, latest, table, keys)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
