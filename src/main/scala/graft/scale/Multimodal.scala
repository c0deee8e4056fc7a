package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json extension): media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-batched decoders (the Scala analog of `mapInPandas` — one
  * decoder instantiation per partition, streamed row batches, bounded
  * memory).
  *
  * The decode itself is a STUB — no image/audio codecs exist in this
  * container — implemented as a deterministic fake so the Spark-side
  * contract (schema, batching, partition sizing) is real and testable;
  * swap [[FakeCodec]] for a real JNI/FFI codec without touching the
  * plumbing.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  /** Pack a text column as a fake media blob (UTF-8 bytes). */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      lit("image/fake").as("media_type"),
      col(textCol).cast("binary").as("media"))

  /** STUB codec: deterministic pseudo-features from the raw bytes.
    * A real implementation would decode pixels/samples here. */
  object FakeCodec {
    def features(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      val n = if (bytes == null) 0 else bytes.length
      val width = n % 640 + 1
      val height = n % 480 + 1
      var checksum = 0L
      var i = 0
      while (i < n) { checksum += bytes(i) & 0xff; i += 1 }
      (n, width, height, checksum)
    }
  }

  /** Frame sampling: the first `maxFrames` fixed-size byte windows per
    * blob (the video-frame / audio-chunk extraction shape), with
    * per-frame checksums. Same partition-batched decoder contract as
    * [[decodeFeatures]]; output is one row per (media, frame) — emitted
    * lazily, so a 100 TB corpus streams frame rows without ever holding
    * a whole blob set in memory. */
  def frameSample(media: DataFrame, frameSize: Int, maxFrames: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", IntegerType, nullable = false),
      StructField("frame_checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "media").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val n = if (bytes == null) 0 else bytes.length
        val frames = math.min(maxFrames, (n + frameSize - 1) / frameSize)
        (0 until frames).iterator.map { f =>
          val start = f * frameSize
          val end = math.min(start + frameSize, n)
          var checksum = 0L
          var i = start
          while (i < end) { checksum += bytes(i) & 0xff; i += 1 }
          Row(r.getAs[Long]("media_id"), f, end - start, checksum)
        }
      }
    }(enc)
  }

  /** Partition-batched "decode": binary blobs → feature columns.
    * mapPartitions keeps one codec per partition (real codecs are
    * expensive to construct) and never materializes more than an
    * iterator page of rows. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "media").mapPartitions { it =>
      // per-partition codec instantiation happens here in a real impl
      it.map { r =>
        val (n, w, h, c) = FakeCodec.features(r.getAs[Array[Byte]]("media"))
        Row(r.getAs[Long]("media_id"), n, w, h, c)
      }
    }(enc)
  }

}
