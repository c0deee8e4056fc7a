package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage abstraction for the medallion tables.
  *
  * The reference writes Delta everywhere (S7-S9,S11-S13); the test
  * harness has plain Spark+parquet. `TableIO` keeps the engine code
  * format-agnostic: a parquet implementation for tests and any
  * Delta/Iceberg implementation can sit behind the same trait
  * (SURVEY §7 risk 3).
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  def exists(spark: SparkSession, table: String): Boolean

  /** S9: keyed upsert (Delta MERGE whenMatched.updateAll /
    * whenNotMatched.insertAll). Generic fallback: source wins on key
    * match, target rows survive only if no source row shares the key —
    * expressed as source ∪ (target left-anti source). The anti-join
    * shuffles both sides on the key (or broadcasts a small source);
    * at 100 TB with Delta present, prefer the transactional MERGE which
    * rewrites only matched files. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val survivors = target.join(source, keys, "left_anti")
    source.unionByName(survivors)
  }

  def upsert(spark: SparkSession, source: DataFrame, table: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Unit = {
    if (!exists(spark, table)) overwrite(source, table, partitionBy)
    else {
      val merged = merge(read(spark, table), source, keys)
      overwrite(merged, table, partitionBy)
    }
  }
}

private[ingest] object FsOps {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete(); ()
  }
}

/** Parquet-backed TableIO rooted at a directory; table name → subdir. */
final class ParquetTableIO(root: String) extends TableIO {
  private def path(table: String) = s"$root/$table"

  /** mergeSchema=true: parquet's read-side union of file schemas — the
    * stand-in for Delta's write-side `mergeSchema` evolution (S7);
    * files written before a column existed surface it as null. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(table))

  def append(df: DataFrame, table: String, partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }

  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String]): Unit = {
    // Durable self-overwrite: the input plan may read the very path we
    // are replacing, so first materialize the result into a staging
    // directory (source files untouched), then swap directories. Unlike
    // persist()+count(), this survives cache eviction / executor loss
    // mid-write — recomputation re-reads the intact source.
    val dest = path(table)
    val staging = s"$dest.__staging_${System.nanoTime()}"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging)
    swapInto(staging, dest)
  }

  /** Replace `dest` with `staging` via two renames — the closest a
    * filesystem gets to atomic; on an object store the versioned
    * [[graft.ingest.VersionedTableIO]] manifest commit replaces this. */
  private def swapInto(staging: String, dest: String): Unit = {
    val destF = new java.io.File(dest)
    val old = new java.io.File(s"$dest.__old_${System.nanoTime()}")
    if (destF.exists() && !destF.renameTo(old))
      throw new java.io.IOException(s"cannot move aside $dest")
    if (!new java.io.File(staging).renameTo(destF)) {
      old.renameTo(destF) // roll back
      throw new java.io.IOException(s"cannot promote $staging to $dest")
    }
    FsOps.deleteRecursively(old)
  }

  def exists(spark: SparkSession, table: String): Boolean =
    new java.io.File(path(table)).exists()

  /** Dynamic partition overwrite: replace ONLY the partitions present
    * in `df`, leaving the rest of the table untouched — the backfill
    * primitive (re-run one day without rewriting a year). Static mode
    * would truncate the whole table first; the write option scopes the
    * dynamic behavior to this write, not the session. */
  def overwritePartitions(df: DataFrame, table: String,
      partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    // A dynamic overwrite deletes the partitions it replaces, so a plan
    // reading the same table must be durably materialized first — stage
    // to disk (not the block cache: eviction mid-write would recompute
    // from partially-deleted source files and lose data).
    val staging = s"${path(table)}.__staging_${System.nanoTime()}"
    df.write.parquet(staging)
    val spark = df.sparkSession
    try {
      spark.read.parquet(staging)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionBy: _*)
        .parquet(path(table))
    } finally FsOps.deleteRecursively(new java.io.File(staging))
  }

  /** Compaction (the BASELINE "read/write + compaction" op): rewrite a
    * table to `numFiles` files — repartition(numFiles) rewrite, the
    * parquet stand-in for Delta OPTIMIZE. */
  def compact(spark: SparkSession, table: String, numFiles: Int): Unit =
    overwrite(read(spark, table).repartition(numFiles), table)

  /** Clustered compaction — the OPTIMIZE ZORDER analog: range-partition
    * + sort on `clusterCols` so each output file covers a narrow value
    * range; parquet row-group min/max stats then let filtered scans
    * skip whole files (data skipping without an index). */
  def compactClustered(spark: SparkSession, table: String, numFiles: Int,
      clusterCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    overwrite(
      read(spark, table)
        .repartitionByRange(numFiles, cols: _*)
        .sortWithinPartitions(cols: _*),
      table)
  }
}
