package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Read-only Delta Lake SNAPSHOT reader: `_delta_log` replay built on
  * public Spark + Jackson, NO delta-spark dependency.
  *
  * Why it exists: the reference's tables are genuine Delta tables
  * (spark/jobs/alphavantage/bronze2_to_silver.py:142-152,
  * coin_to_delta_w_cp.py:124), while this engine's own versioned
  * format ([[VersionedTableIO]]) re-derives the log from first
  * principles because the harness classpath ships no delta jars. That
  * left one real interop gap: an engine deployed NEXT TO the
  * reference could not read the tables the reference had already
  * written. This adapter closes the read side of that gap using only
  * the PUBLIC Delta transaction-log protocol
  * (https://github.com/delta-io/delta/blob/master/PROTOCOL.md):
  * newline-delimited JSON commits of add/remove/metaData/protocol
  * actions under `_delta_log/`, optionally compacted into classic
  * (single- or multi-part) checkpoint parquet files.
  *
  * Supported: snapshot reads at the latest or a `versionAsOf`
  * version; partitioned tables (hive-style directory layouts read
  * natively via `basePath` so partition pruning still works;
  * non-hive layouts fall back to a per-partition-value union);
  * classic checkpoints; percent-encoded file paths; reader protocol
  * versions 1-3 where every table feature is in the supported set.
  * Rejected loudly rather than misread: column mapping (`id`/`name`
  * modes rename the parquet columns), deletion vectors (an `add`
  * carrying a DV would resurrect deleted rows), v2 checkpoints, and
  * any unknown reader feature — the failure mode of a protocol
  * under-read is silent wrong data, so anything not understood is an
  * error by design.
  *
  * Scale shape: log replay is driver-side (list + parse the JSON
  * commits after the newest checkpoint ≤ target — the same work
  * delta-spark's own Snapshot does), and the data read hands Spark
  * the full active-file list in ONE `spark.read.parquet(files*)`
  * call, so scan parallelism, column pruning, and row-group pushdown
  * are untouched. Driver memory is bounded by the active-file COUNT
  * (path strings), not data size — the delta-spark caveat at
  * million-file tables applies here identically. */
object DeltaLakeRead {

  private val mapper = new ObjectMapper()

  /** One active data file: table-relative decoded path + the
    * partition-column values the log assigns it (null = SQL NULL). */
  final case class AddFile(path: String,
      partitionValues: Map[String, Option[String]])

  /** Replayed log state at one version. */
  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile])

  /** Reader features this adapter implements. `timestampNtz` and
    * `typeWidening` only change column TYPES (carried in
    * schemaString, which Spark parses natively); everything that
    * changes how FILES must be interpreted is unsupported. */
  private val SupportedReaderFeatures: Set[String] =
    Set("timestampNtz", "typeWidening", "typeWidening-preview",
      "vacuumProtocolCheck")

  /** Latest committed version of the table (max commit/checkpoint
    * number in `_delta_log`). */
  def latestVersion(tablePath: String): Long = {
    val (commits, checkpoints) = listLog(tablePath)
    (commits.keySet ++ checkpoints.keySet).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"$tablePath/_delta_log holds no commits — not a Delta table"))
  }

  /** Snapshot the table as a DataFrame at `versionAsOf` (default:
    * latest). */
  def snapshot(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val st = state(spark, tablePath, versionAsOf)
    val root = new File(tablePath).getAbsolutePath
    val paths = st.files.map(f => s"$root/${f.path}")
    val dataSchema = StructType(
      st.schema.filterNot(f => st.partitionColumns.contains(f.name)))
    if (st.files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st.schema)
    } else if (st.partitionColumns.isEmpty) {
      spark.read.schema(dataSchema).parquet(paths: _*)
    } else if (hiveLayout(st)) {
      // hive-style dirs: partition columns come back from the path via
      // basePath inference — ONE scan relation, pruning intact. Cast
      // to the log schema's types in its column order (inference may
      // pick narrower types than schemaString declares).
      spark.read.option("basePath", root).schema(
        StructType(dataSchema ++
          st.schema.filter(f => st.partitionColumns.contains(f.name))))
        .parquet(paths: _*)
        .select(st.schema.map(f => col(f.name)): _*)
    } else {
      // non-hive layout: per-distinct-partition-value reads unioned.
      // Fine at catalog-sized partition counts; a table that is BOTH
      // non-hive and hugely partitioned needs a custom FileIndex.
      st.files.groupBy(_.partitionValues).map { case (pv, fs) =>
        val base = spark.read.schema(dataSchema)
          .parquet(fs.map(f => s"$root/${f.path}"): _*)
        st.partitionColumns.foldLeft(base) { (df, k) =>
          val t = st.schema(k).dataType
          df.withColumn(k,
            pv.get(k).flatten.map(v => lit(v).cast(t))
              .getOrElse(lit(null).cast(t)))
        }.select(st.schema.map(f => col(f.name)): _*)
      }.reduce(_ unionByName _)
    }
  }

  /** Replay the log to `versionAsOf` (default latest) and return the
    * resolved state — exposed for specs and for callers that need the
    * file list (e.g. incremental ingestion watermarking). */
  def state(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): Snapshot = {
    val (commits, checkpoints) = listLog(tablePath)
    val latest = (commits.keySet ++ checkpoints.keySet).maxOption
      .getOrElse(throw new IllegalArgumentException(
        s"$tablePath/_delta_log holds no commits — not a Delta table"))
    val target = versionAsOf.getOrElse(latest)
    require(target <= latest,
      s"versionAsOf $target > latest committed version $latest")

    val active = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    var schemaString: Option[String] = None
    var partCols: Seq[String] = Nil
    var config: Map[String, String] = Map.empty
    var minReader = 1
    var readerFeatures: Set[String] = Set.empty

    def applyAdd(path: String, pv: Map[String, Option[String]],
        hasDv: Boolean): Unit = {
      require(!hasDv, s"add of $path carries a deletion vector — " +
        "unsupported by this reader (rows would be resurrected)")
      val p = decode(path)
      active.remove(p); active.put(p, AddFile(p, pv)); ()
    }

    val cp = checkpoints.keySet.filter(_ <= target).maxOption
    cp.foreach { v =>
      val df = spark.read.parquet(checkpoints(v).map(_.getPath): _*)
      val names = df.schema.fieldNames.toSet
      if (names.contains("metaData")) {
        df.select("metaData.schemaString", "metaData.partitionColumns",
          "metaData.configuration")
          .collect().find(_.get(0) != null).foreach { r =>
            schemaString = Some(r.getString(0))
            partCols = r.getSeq[String](1)
            config = Option(r.getJavaMap[String, String](2))
              .map(_.asScala.toMap).getOrElse(Map.empty)
          }
      }
      if (names.contains("protocol")) {
        val pf = df.schema("protocol").dataType.asInstanceOf[StructType]
          .fieldNames.toSet
        val cols = Seq("protocol.minReaderVersion") ++
          (if (pf.contains("readerFeatures")) Seq("protocol.readerFeatures")
           else Nil)
        df.select(cols.head, cols.tail: _*)
          .collect().find(_.get(0) != null).foreach { r =>
            minReader = r.getInt(0)
            readerFeatures =
              if (cols.size > 1 && !r.isNullAt(1))
                r.getSeq[String](1).toSet
              else Set.empty
          }
      }
      if (names.contains("add")) {
        val af = df.schema("add").dataType.asInstanceOf[StructType]
          .fieldNames.toSet
        val dvCol =
          if (af.contains("deletionVector")) "add.deletionVector.storageType"
          else "add.size" // never null on an add row, reads as "no DV"
        df.select("add.path", "add.partitionValues", dvCol)
          .collect().foreach { r =>
            if (!r.isNullAt(0))
              applyAdd(r.getString(0),
                Option(r.getJavaMap[String, String](1))
                  .map(_.asScala.toMap.map { case (k, v2) =>
                    k -> Option(v2) }).getOrElse(Map.empty),
                hasDv = af.contains("deletionVector") && !r.isNullAt(2))
          }
      }
    }

    val from = cp.map(_ + 1).getOrElse(0L)
    (from to target).foreach { v =>
      val f = commits.getOrElse(v, throw new IllegalArgumentException(
        s"commit $v missing from $tablePath/_delta_log (gap after " +
        s"checkpoint ${cp.getOrElse(-1L)}) — cannot replay to $target"))
      Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("metaData")) {
            val m = n.get("metaData")
            schemaString = Some(m.get("schemaString").asText())
            partCols = Option(m.get("partitionColumns")).toSeq
              .flatMap(_.elements().asScala.map(_.asText()))
            config = Option(m.get("configuration")).map(c =>
              c.properties().asScala
                .map(e => e.getKey -> e.getValue.asText()).toMap)
              .getOrElse(Map.empty)
          }
          if (n.has("protocol")) {
            val p = n.get("protocol")
            minReader = p.get("minReaderVersion").asInt()
            readerFeatures = Option(p.get("readerFeatures"))
              .filterNot(_.isNull)
              .map(_.elements().asScala.map(_.asText()).toSet)
              .getOrElse(Set.empty)
          }
          if (n.has("add")) {
            val a = n.get("add")
            applyAdd(a.get("path").asText(),
              Option(a.get("partitionValues")).map(pv =>
                pv.properties().asScala.map(e => e.getKey ->
                  (if (e.getValue.isNull) None
                   else Some(e.getValue.asText()))).toMap)
                .getOrElse(Map.empty),
              hasDv = a.has("deletionVector") &&
                !a.get("deletionVector").isNull)
          }
          if (n.has("remove")) {
            active.remove(decode(n.get("remove").get("path").asText())); ()
          }
        }
    }

    require(minReader <= 3,
      s"minReaderVersion $minReader > 3 — protocol newer than this reader")
    if (minReader >= 3) {
      val unsupported = readerFeatures -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"unsupported Delta reader features: ${unsupported.mkString(", ")}")
    }
    val cmMode = config.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none",
      s"delta.columnMapping.mode=$cmMode — parquet column names differ " +
      "from the logical schema; unsupported by this reader")

    val schema = DataType.fromJson(schemaString.getOrElse(
      throw new IllegalArgumentException(
        s"no metaData action found replaying $tablePath to $target")))
      .asInstanceOf[StructType]
    Snapshot(target, schema, partCols, active.values.toSeq)
  }

  /** True when every active file path carries every partition column
    * as a hive-style `k=v` directory segment. */
  private def hiveLayout(st: Snapshot): Boolean =
    st.files.forall(f => st.partitionColumns.forall(k =>
      f.path.split('/').exists(_.startsWith(s"$k="))))

  private def decode(p: String): String =
    java.net.URLDecoder.decode(p, "UTF-8")

  /** (commit version → file, checkpoint version → part files). */
  private def listLog(tablePath: String)
      : (Map[Long, File], Map[Long, Seq[File]]) = {
    val dir = new File(tablePath, "_delta_log")
    require(dir.isDirectory, s"$dir does not exist — not a Delta table")
    val files = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    val commit = "([0-9]{20})\\.json".r
    val cpClassic = "([0-9]{20})\\.checkpoint\\.parquet".r
    val cpPart = "([0-9]{20})\\.checkpoint\\.[0-9]+\\.[0-9]+\\.parquet".r
    val cpV2 =
      "([0-9]{20})\\.checkpoint\\.[-a-zA-Z0-9]+\\.(?:json|parquet)".r
    val commits = files.flatMap(f => f.getName match {
      case commit(v) => Some(v.toLong -> f)
      case _ => None
    }).toMap
    files.foreach(f => f.getName match {
      case cpClassic(_) | cpPart(_) => ()
      case cpV2(v) => throw new IllegalArgumentException(
        s"v2 (UUID-named) checkpoint at version ${v.toLong} — " +
        "unsupported by this reader")
      case _ => ()
    })
    val checkpoints = files.flatMap(f => f.getName match {
      case cpClassic(v) => Some(v.toLong -> f)
      case cpPart(v) => Some(v.toLong -> f)
      case _ => None
    }).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    (commits, checkpoints)
  }
}
