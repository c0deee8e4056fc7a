package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's hand-rolled incremental contract as a small utility
  * (SURVEY §2.10): processed-file log + anti-join discovery
  * (alphavantage/transform_into_delta.py:48-65,104; J1), raw FS listing
  * (coin/convert_to_delta.py:62-83; S16 — native Hadoop calls, the py4j
  * hop disappears in Scala), and high-watermark filters (P5/J2).
  */
object IncrementalSource {

  /** S16: recursive Hadoop FileSystem listing → (path, length, mtime).
    * Driver-side by design: listing is metadata-scale, not data-scale —
    * but for object stores with millions of keys prefer
    * [[Readers.binaryFiles]] which distributes the listing. */
  def listFiles(spark: SparkSession, dir: String,
      suffix: String = ""): Seq[(String, Long, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val buf = Seq.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (suffix.isEmpty || p.endsWith(suffix))
        buf += ((p, f.getLen, f.getModificationTime))
    }
    buf.result().sortBy(_._1)
  }

  /** J1: new-file detection — listing anti-join the processed log.
    * The log side is broadcast (bounded by files-ever-processed). */
  def newFiles(files: DataFrame, processedLog: DataFrame,
      pathCol: String = "path"): DataFrame =
    files.join(broadcast(processedLog.select(pathCol).distinct()),
      Seq(pathCol), "left_anti")

  /** P5: scalar high-watermark filter — rows strictly past the stored
    * watermark (uber/bronze2_to_silver.py:60). */
  def pastWatermark(df: DataFrame, watermarkCol: String,
      watermark: Option[Any]): DataFrame =
    watermark.fold(df)(w => df.filter(col(watermarkCol) > lit(w)))

  /** J2: per-key high-watermark — keep rows newer than each key's max
    * in the processed set; keys never seen pass through. At scale this
    * is the skew-prone join: processed is pre-aggregated to one row per
    * key (small), so it broadcasts; if the key space itself is huge,
    * fall back to a shuffled join + AQE skew handling. */
  def pastKeyedWatermark(df: DataFrame, processed: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val marks = processed.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("__max_ts"))
    df.join(broadcast(marks), Seq(keyCol), "left")
      .filter(col("__max_ts").isNull || col(tsCol) > col("__max_ts"))
      .drop("__max_ts")
  }

  /** A1-style max watermark read: None on empty/missing. */
  def currentWatermark(df: DataFrame, c: String): Option[Any] =
    Option(df.agg(max(col(c))).first().get(0))
}
