package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}
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
  * versions 1-3 where every table feature is in the supported set;
  * column mapping in `name` mode (each logical field carries
  * `delta.columnMapping.physicalName` metadata naming the parquet
  * column — the read runs against the physical schema and a final
  * positional cast restores logical names, nested fields included;
  * `add.partitionValues` and hive directory names use PHYSICAL
  * names per the protocol); deletion vectors (`u`/`p`/`i` storage,
  * decoded by [[DeletionVectors]] — rows at deleted positions are
  * subtracted via `_metadata.row_index` with a cardinality-guarded
  * broadcast anti-join, the same size-guard posture as
  * [[VersionedTableIO]]'s native DV reads).
  *
  * Rejected loudly rather than misread: column mapping `id` mode
  * (parquet field-id resolution needs reader support plain
  * `spark.read.parquet` does not expose), v2 checkpoints, and any
  * unknown reader feature — the failure mode of a protocol
  * under-read is silent wrong data, so anything not understood is an
  * error by design.
  *
  * Scale shape: log replay is driver-side (list + parse the JSON
  * commits after the newest checkpoint ≤ target — the same work
  * delta-spark's own Snapshot does), and the data read hands Spark
  * the full active-file list in ONE `spark.read.parquet(files*)`
  * call, so scan parallelism, column pruning, and row-group pushdown
  * are untouched. DV-bearing files read as a SECOND relation whose
  * bitmaps are decoded on EXECUTORS (one task per descriptor — the
  * driver never holds position sets, only descriptors). Driver
  * memory is bounded by the active-file COUNT (path strings), not
  * data size — the delta-spark caveat at million-file tables applies
  * here identically. */
object DeltaLakeRead {

  private val mapper = new ObjectMapper()

  /** One active data file: table-relative decoded path, the raw
    * (log-encoded) path — kept verbatim for checkpoint re-emission —
    * the partition-column values the log assigns it (null = SQL
    * NULL), the logged size/modificationTime (carried so a checkpoint
    * can reproduce the action faithfully), and its deletion vector,
    * if any. */
  final case class AddFile(path: String, rawPath: String,
      partitionValues: Map[String, Option[String]],
      size: Long, modificationTime: Long,
      dv: Option[DeletionVectors.Descriptor])

  /** Replayed log state at one version. The protocol/metaData extras
    * (config, id, createdTime, versions, feature sets) exist so a
    * checkpoint writer ([[DeltaLakeWrite.checkpoint]]) can reproduce
    * the table's actions faithfully. */
  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile],
      config: Map[String, String] = Map.empty,
      metaId: String = "", createdTime: Option[Long] = None,
      minReader: Int = 1, minWriter: Int = 2,
      readerFeatures: Seq[String] = Nil, writerFeatures: Seq[String] = Nil)

  /** Reader features this adapter implements. `timestampNtz` and
    * `typeWidening` only change column TYPES (carried in
    * schemaString, which Spark parses natively); `columnMapping` is
    * the physical-rename path below (name mode only — id mode is
    * still gated in [[state]]); `deletionVectors` is the
    * position-subtract path below. */
  private val SupportedReaderFeatures: Set[String] =
    Set("timestampNtz", "typeWidening", "typeWidening-preview",
      "vacuumProtocolCheck", "columnMapping", "deletionVectors")

  private val PhysicalNameKey = "delta.columnMapping.physicalName"

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
    val cmName = st.config.get("delta.columnMapping.mode").contains("name")

    // logical field -> parquet (physical) name; identity without
    // column mapping
    def physName(f: StructField): String =
      if (cmName && f.metadata.contains(PhysicalNameKey))
        f.metadata.getString(PhysicalNameKey)
      else f.name
    def physicalize(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(name = physName(f), dataType = physicalize(f.dataType))))
      case a: ArrayType => a.copy(elementType = physicalize(a.elementType))
      case m: MapType => m.copy(keyType = physicalize(m.keyType),
        valueType = physicalize(m.valueType))
      case o => o
    }
    // the metadata-free logical type, for the positional rename cast
    def strip(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, strip(f.dataType), f.nullable)))
      case a: ArrayType => a.copy(elementType = strip(a.elementType))
      case m: MapType => m.copy(keyType = strip(m.keyType),
        valueType = strip(m.valueType))
      case o => o
    }
    // resolve a metaData.partitionColumns entry (logical per the
    // protocol; physical accepted defensively) to its schema field
    def partField(name: String): StructField =
      st.schema.find(_.name == name)
        .orElse(st.schema.find(f => physName(f) == name))
        .getOrElse(throw new IllegalArgumentException(
          s"partition column $name not in the table schema"))
    val partFields = st.partitionColumns.map(partField)
    val physPartNames = partFields.map(physName)
    val dataFieldsPhys = st.schema.fields
      .filterNot(f => partFields.exists(_.name == f.name))
      .map(f => f.copy(name = physName(f),
        dataType = physicalize(f.dataType), metadata =
          org.apache.spark.sql.types.Metadata.empty))
    val dataSchemaPhys = StructType(dataFieldsPhys)
    // final projection: physical columns back to logical names/types
    // (cast between structs matches POSITIONALLY, renaming nested
    // fields; types are identical so it is a rename-only no-op)
    def logicalSelect(extra: Seq[Column]): Seq[Column] =
      st.schema.fields.toSeq.map(f =>
        col(quoted(physName(f))).cast(strip(f.dataType)).as(f.name)) ++ extra

    def hiveLayout(files: Seq[AddFile]): Boolean =
      files.forall(f => physPartNames.forall(k =>
        f.path.split('/').exists(_.startsWith(s"$k="))))

    /** Read a subset of active files, optionally carrying
      * `__file`/`__pos` parquet metadata columns for DV masking. */
    def readFiles(files: Seq[AddFile], withMeta: Boolean): DataFrame = {
      val metaCols =
        if (withMeta) Seq(col("_metadata.file_path").as("__file"),
          col("_metadata.row_index").as("__pos"))
        else Nil
      val paths = files.map(f => s"$root/${f.path}")
      if (st.partitionColumns.isEmpty) {
        spark.read.schema(dataSchemaPhys).parquet(paths: _*)
          .select(logicalSelect(metaCols): _*)
      } else if (hiveLayout(files)) {
        // hive-style dirs: partition columns come back from the path
        // via basePath inference — ONE scan relation, pruning intact.
        // Cast to the log schema's types in its column order
        // (inference may pick narrower types than schemaString
        // declares).
        spark.read.option("basePath", root).schema(
          StructType(dataFieldsPhys ++ partFields.map(f =>
            f.copy(name = physName(f), dataType = physicalize(f.dataType),
              metadata = org.apache.spark.sql.types.Metadata.empty))))
          .parquet(paths: _*)
          .select(logicalSelect(metaCols): _*)
      } else {
        // non-hive layout: per-distinct-partition-value reads unioned.
        // Fine at catalog-sized partition counts; a table that is BOTH
        // non-hive and hugely partitioned needs a custom FileIndex.
        files.groupBy(_.partitionValues).map { case (pv, fs) =>
          val base = spark.read.schema(dataSchemaPhys)
            .parquet(fs.map(f => s"$root/${f.path}"): _*)
          partFields.foldLeft(base) { (df, f) =>
            val t = strip(f.dataType)
            // partitionValues are keyed by PHYSICAL name under column
            // mapping (logical accepted defensively)
            val v = pv.get(physName(f)).orElse(pv.get(f.name)).flatten
            df.withColumn(physName(f),
              v.map(s => lit(s).cast(t)).getOrElse(lit(null).cast(t)))
          }.select(logicalSelect(metaCols): _*)
        }.reduce(_ unionByName _)
      }
    }

    val (dvFiles, cleanFiles) = st.files.partition(_.dv.isDefined)
    val parts = Seq(
      Option.when(cleanFiles.nonEmpty)(readFiles(cleanFiles,
        withMeta = false)),
      Option.when(dvFiles.nonEmpty)(
        subtractDeleted(spark, root, readFiles(dvFiles, withMeta = true),
          dvFiles))).flatten
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(st.schema.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable))))
    else parts.reduce(_ unionByName _)
  }

  /** Filter out each file's DV positions: decode bitmaps on
    * EXECUTORS (one task per descriptor), anti-join on the
    * normalized file path + `_metadata.row_index`. The join side is
    * broadcast when the log-carried cardinality sum is small (the
    * common O(k)-delete case) and falls back to a shuffle anti-join
    * above `spark.graft.dv.broadcastMaxRows` (default 2^20) — the
    * same guard [[VersionedTableIO]] applies to its native DVs. */
  private def subtractDeleted(spark: SparkSession, root: String,
      df: DataFrame, dvFiles: Seq[AddFile]): DataFrame = {
    val descs = dvFiles.map(f => (s"$root/${f.path}", f.dv.get))
    val totalCard = descs.map(_._2.cardinality).sum
    val rootStr = root
    val posRdd = spark.sparkContext
      .parallelize(descs, math.max(1, math.min(descs.size, 32)))
      .flatMap { case (p, d) =>
        DeletionVectors.positions(new File(rootStr), d)
          .map(pos => Row(p, pos))
      }
    val posSchema = StructType(Seq(
      StructField("__dfile", org.apache.spark.sql.types.StringType),
      StructField("__dpos", org.apache.spark.sql.types.LongType)))
    val deletedRaw = spark.createDataFrame(posRdd, posSchema)
    val maxBroadcast = spark.conf
      .getOption("spark.graft.dv.broadcastMaxRows")
      .map(_.toLong).getOrElse(1L << 20)
    val deleted =
      if (totalCard <= maxBroadcast) broadcast(deletedRaw) else deletedRaw
    // _metadata.file_path is a URI ("file:///..."); normalize both the
    // scheme prefix and its percent-encoding to the plain decoded path
    val normFile = expr(
      "url_decode(regexp_replace(__file, '^[a-z]+:/+', '/'))")
    df.withColumn("__nfile", normFile)
      .join(deleted,
        col("__nfile") === col("__dfile") && col("__pos") === col("__dpos"),
        "left_anti")
      .drop("__file", "__pos", "__nfile")
  }

  /** Replay the log to `versionAsOf` (default latest) and return the
    * resolved state — exposed for specs and for callers that need the
    * file list (e.g. incremental ingestion watermarking, checkpoint
    * emission). */
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
    var metaId = ""
    var createdTime: Option[Long] = None
    var minReader = 1
    var minWriter = 2
    var readerFeatures: Seq[String] = Nil
    var writerFeatures: Seq[String] = Nil

    def applyAdd(rawPath: String, pv: Map[String, Option[String]],
        size: Long, modTime: Long,
        dv: Option[DeletionVectors.Descriptor]): Unit = {
      val p = decode(rawPath)
      active.remove(p)
      active.put(p, AddFile(p, rawPath, pv, size, modTime, dv)); ()
    }

    val cp = checkpoints.keySet.filter(_ <= target).maxOption
    cp.foreach { v =>
      val df = spark.read.parquet(checkpoints(v).map(_.getPath): _*)
      val names = df.schema.fieldNames.toSet
      if (names.contains("metaData")) {
        val mf = df.schema("metaData").dataType.asInstanceOf[StructType]
          .fieldNames.toSet
        val base = Seq("metaData.schemaString", "metaData.partitionColumns",
          "metaData.configuration")
        val extra = Seq("id", "createdTime").filter(mf.contains)
          .map(c => s"metaData.$c")
        val cols = base ++ extra
        df.select(cols.head, cols.tail: _*)
          .collect().find(_.get(0) != null).foreach { r =>
            schemaString = Some(r.getString(0))
            partCols = r.getSeq[String](1)
            config = Option(r.getJavaMap[String, String](2))
              .map(_.asScala.toMap).getOrElse(Map.empty)
            extra.zipWithIndex.foreach { case (c, i) =>
              if (!r.isNullAt(3 + i)) c match {
                case "metaData.id" => metaId = r.getString(3 + i)
                case _ => createdTime = Some(r.getLong(3 + i))
              }
            }
          }
      }
      if (names.contains("protocol")) {
        val pf = df.schema("protocol").dataType.asInstanceOf[StructType]
          .fieldNames.toSet
        val cols = Seq("protocol.minReaderVersion") ++
          Seq("minWriterVersion", "readerFeatures", "writerFeatures")
            .filter(pf.contains).map(c => s"protocol.$c")
        df.select(cols.head, cols.tail: _*)
          .collect().find(_.get(0) != null).foreach { r =>
            minReader = r.getInt(0)
            cols.drop(1).zipWithIndex.foreach { case (c, i) =>
              if (!r.isNullAt(1 + i)) c match {
                case "protocol.minWriterVersion" =>
                  minWriter = r.getInt(1 + i)
                case "protocol.readerFeatures" =>
                  readerFeatures = r.getSeq[String](1 + i)
                case _ => writerFeatures = r.getSeq[String](1 + i)
              }
            }
          }
      }
      if (names.contains("add")) {
        val af = df.schema("add").dataType.asInstanceOf[StructType]
          .fieldNames.toSet
        val dvCols =
          if (af.contains("deletionVector"))
            Seq("add.deletionVector.storageType",
              "add.deletionVector.pathOrInlineDv",
              "add.deletionVector.offset",
              "add.deletionVector.sizeInBytes",
              "add.deletionVector.cardinality")
          else Nil
        val cols = Seq("add.path", "add.partitionValues", "add.size",
          "add.modificationTime") ++ dvCols
        df.select(cols.head, cols.tail: _*)
          .collect().foreach { r =>
            if (!r.isNullAt(0)) {
              val dv =
                if (dvCols.nonEmpty && !r.isNullAt(4))
                  Some(DeletionVectors.Descriptor(r.getString(4),
                    r.getString(5),
                    if (r.isNullAt(6)) None else Some(r.getInt(6)),
                    r.getInt(7), r.getLong(8)))
                else None
              applyAdd(r.getString(0),
                Option(r.getJavaMap[String, String](1))
                  .map(_.asScala.toMap.map { case (k, v2) =>
                    k -> Option(v2) }).getOrElse(Map.empty),
                if (r.isNullAt(2)) 0L else r.getLong(2),
                if (r.isNullAt(3)) 0L else r.getLong(3), dv)
            }
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
            metaId = Option(m.get("id")).map(_.asText()).getOrElse("")
            createdTime = Option(m.get("createdTime"))
              .filterNot(_.isNull).map(_.asLong())
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
            minWriter = Option(p.get("minWriterVersion"))
              .map(_.asInt()).getOrElse(2)
            def feats(k: String): Seq[String] =
              Option(p.get(k)).filterNot(_.isNull)
                .map(_.elements().asScala.map(_.asText()).toSeq)
                .getOrElse(Nil)
            readerFeatures = feats("readerFeatures")
            writerFeatures = feats("writerFeatures")
          }
          if (n.has("add")) {
            val a = n.get("add")
            val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
              .map { d =>
                DeletionVectors.Descriptor(
                  d.get("storageType").asText(),
                  d.get("pathOrInlineDv").asText(),
                  Option(d.get("offset")).filterNot(_.isNull)
                    .map(_.asInt()),
                  d.get("sizeInBytes").asInt(),
                  d.get("cardinality").asLong())
              }
            applyAdd(a.get("path").asText(),
              Option(a.get("partitionValues")).map(pv =>
                pv.properties().asScala.map(e => e.getKey ->
                  (if (e.getValue.isNull) None
                   else Some(e.getValue.asText()))).toMap)
                .getOrElse(Map.empty),
              Option(a.get("size")).map(_.asLong()).getOrElse(0L),
              Option(a.get("modificationTime")).map(_.asLong())
                .getOrElse(0L), dv)
          }
          if (n.has("remove")) {
            active.remove(decode(n.get("remove").get("path").asText())); ()
          }
        }
    }

    require(minReader <= 3,
      s"minReaderVersion $minReader > 3 — protocol newer than this reader")
    if (minReader >= 3) {
      val unsupported = readerFeatures.toSet -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"unsupported Delta reader features: ${unsupported.mkString(", ")}")
    }
    val cmMode = config.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name",
      s"delta.columnMapping.mode=$cmMode — only 'none' and 'name' are " +
      "supported ('id' needs parquet field-id resolution this reader " +
      "does not implement)")

    val schema = DataType.fromJson(schemaString.getOrElse(
      throw new IllegalArgumentException(
        s"no metaData action found replaying $tablePath to $target")))
      .asInstanceOf[StructType]
    if (cmMode == "name")
      schema.fields.foreach(f => require(
        f.metadata.contains(PhysicalNameKey),
        s"column mapping is 'name' but field ${f.name} carries no " +
        s"$PhysicalNameKey metadata — refusing to guess"))
    Snapshot(target, schema, partCols, active.values.toSeq, config,
      metaId, createdTime, minReader, minWriter, readerFeatures,
      writerFeatures)
  }

  private def quoted(name: String): String = s"`$name`"

  /** Percent-decode a log path. URLDecoder would also turn a literal
    * `+` into a space — the protocol's encoding is URI-style percent
    * escaping where `+` means `+`, so it is pre-escaped. */
  private def decode(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

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
