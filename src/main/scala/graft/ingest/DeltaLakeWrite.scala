package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Append-only Delta Lake WRITER — the other half of the
  * [[DeltaLakeRead]] interop story: tables this engine lands can be
  * read back by `spark.read.format("delta")` on the reference's own
  * stack (delta-spark), because what goes on disk is the public
  * protocol and nothing else — parquet data files plus
  * newline-delimited JSON `add`/`metaData`/`protocol` actions under
  * `_delta_log/` (PROTOCOL.md). Honesty note: the harness classpath
  * carries no delta jars, so cross-engine reads are verified against
  * [[DeltaLakeRead]] plus the protocol document, not against
  * delta-spark itself; the emitted log uses only protocol
  * (1, 2) — the floor every Delta reader since 0.x accepts — and no
  * optional feature, precisely to keep that surface trivially
  * compatible.
  *
  * Scope: CREATE (version 0) and APPEND — the reference's own write
  * pattern for bronze ingest (append + checkpointed stream sinks).
  * Overwrite/MERGE/DELETE stay with the engine's native
  * [[VersionedTableIO]]; this writer exists for interop hand-off, not
  * as a second table format.
  *
  * Mechanics: data files are staged by a normal
  * `df.write.partitionBy(...).parquet` into a dot-prefixed temp dir
  * inside the table root (invisible to Delta readers and to Spark's
  * own parquet listings), then MOVED — same filesystem, metadata-only
  * rename — into place keeping Spark's unique part-file names; the
  * commit claims version slot `%020d.json` with a hard link (atomic
  * create-if-absent — the same conditional-put [[VersionedTableIO]]
  * uses), so concurrent appenders serialize by retrying onto the next
  * slot and never corrupt the log. Appends are add-only, hence
  * trivially commutative — no conflict detection needed beyond the
  * slot claim. */
object DeltaLakeWrite {

  private val om = new ObjectMapper()

  /** Append `df` (creating the table at version 0 when absent).
    * Returns the committed version. Partition VALUES are restricted
    * to `[A-Za-z0-9._-]` — enough for the reference's `date=`/
    * `symbol=` layouts — so hive-dir names, log partitionValues, and
    * un-escaped paths all agree by construction; anything else is
    * rejected rather than escaped three slightly different ways.
    *
    * Every `checkpointInterval`-th version (the protocol's classic
    * default, 10) additionally lands a classic checkpoint parquet +
    * `_last_checkpoint`, so a table this engine keeps appending to
    * stays cheap for EVERY Delta reader — without it each snapshot
    * replays one JSON commit per append forever. 0 disables. */
  def append(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil, checkpointInterval: Int = 10): Long = {
    val root = new File(tablePath)
    val log = new File(root, "_delta_log")
    log.mkdirs()

    val creating = Option(log.listFiles()).getOrElse(Array.empty)
      .forall(f => !f.getName.matches("[0-9]{20}\\.json"))
    if (!creating) {
      val st = DeltaLakeRead.state(df.sparkSession, tablePath)
      // a column-mapped table's parquet files carry PHYSICAL names;
      // this writer stages with logical names — appending would land
      // files the table's own schema cannot resolve
      val cm = st.config.getOrElse("delta.columnMapping.mode", "none")
      require(cm == "none",
        s"table has delta.columnMapping.mode=$cm — this append-only " +
        "writer stages logical-named parquet and cannot append to a " +
        "column-mapped table")
      // writer-protocol honesty: a feature this writer does not
      // implement but that CONSTRAINS writes (CHECK constraints,
      // generated/identity columns, invariants) would be silently
      // violated by a blind append — reject when one is actually in
      // force. Feature flags that do not constrain an append
      // (deletionVectors: appends create none; appendOnly: we only
      // append; changeDataFeed: CDC of an append derives from the add
      // actions) pass.
      require(st.minWriter <= 7,
        s"minWriterVersion ${st.minWriter} > 7 — protocol newer than " +
        "this writer")
      val unsupportedW = st.writerFeatures.toSet -- Set(
        "deletionVectors", "appendOnly", "vacuumProtocolCheck",
        "timestampNtz", "typeWidening", "typeWidening-preview",
        "changeDataFeed", "invariants", "checkConstraints",
        "generatedColumns", "identityColumns")
      require(unsupportedW.isEmpty,
        s"unsupported Delta writer features: ${unsupportedW.mkString(", ")}")
      val constraintKeys = st.config.keys
        .filter(_.startsWith("delta.constraints.")).toSeq
      require(constraintKeys.isEmpty,
        s"table carries CHECK constraints (${constraintKeys.mkString(", ")})" +
        " — this writer does not evaluate them; appending would bypass " +
        "enforcement")
      st.schema.fields.foreach { f =>
        Seq("delta.invariants", "delta.generationExpression",
          "delta.identity.start").foreach(k =>
          require(!f.metadata.contains(k),
            s"column ${f.name} carries $k — this writer does not " +
            "enforce it; appending would bypass it"))
      }
      require(st.partitionColumns == partitionBy,
        s"table is partitioned by ${st.partitionColumns.mkString(",")}, " +
        s"append requested ${partitionBy.mkString(",")}")
      val want = st.schema.map(f => (f.name, f.dataType))
      val got = df.schema.map(f => (f.name, f.dataType))
      require(want == got,
        s"schema mismatch: table has $want, append has $got")
    } else {
      require(partitionBy.forall(df.columns.contains),
        s"partition columns ${partitionBy.mkString(",")} missing from df")
    }

    // stage under a dot-dir: Delta readers only trust the log, and
    // Spark/parquet listings skip dot-prefixed paths, so a crashed
    // stage leaves garbage, never phantom rows
    val stage = new File(root, s".stage-${java.util.UUID.randomUUID()}")
    df.write.partitionBy(partitionBy: _*).parquet(stage.getPath)

    final case class Staged(rel: String, pv: Map[String, String],
        size: Long)
    def walk(dir: File, relDir: String,
        pv: Map[String, String]): Seq[Staged] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        case d if d.isDirectory && d.getName.contains("=") =>
          val Array(k, v) = d.getName.split("=", 2)
          require(v.matches("[A-Za-z0-9._-]+"),
            s"partition value '$v' needs escaping — unsupported " +
            "(use [A-Za-z0-9._-])")
          walk(d, s"$relDir${d.getName}/", pv + (k -> v))
        case f if f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet") =>
          val rel = s"$relDir${f.getName}"
          val dest = new File(root, rel)
          dest.getParentFile.mkdirs()
          Files.move(f.toPath, dest.toPath,
            StandardCopyOption.ATOMIC_MOVE)
          Seq(Staged(rel, pv, dest.length()))
        case _ => Nil
      }
    val staged = walk(stage, "", Map.empty)
    rmTree(stage)

    val now = System.currentTimeMillis()
    val addLines = staged.map { s =>
      val n = om.createObjectNode(); val a = n.putObject("add")
      a.put("path", s.rel)
      val p = a.putObject("partitionValues")
      s.pv.foreach { case (k, v) => p.put(k, v) }
      a.put("size", s.size)
      a.put("modificationTime", now)
      a.put("dataChange", true)
      om.writeValueAsString(n)
    }
    val headerLines = if (creating) {
      val proto = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      val m = om.createObjectNode(); val md = m.putObject("metaData")
      md.put("id", java.util.UUID.randomUUID().toString)
      val fmt = md.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      md.put("schemaString", df.schema.json)
      val pc = md.putArray("partitionColumns"); partitionBy.foreach(pc.add)
      md.putObject("configuration")
      md.put("createdTime", now)
      Seq(proto, om.writeValueAsString(m))
    } else Nil
    val body = (headerLines ++ addLines).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)

    // claim the next slot: hard link = atomic create-if-absent
    val tmp = Files.createTempFile(log.toPath, ".commit", ".tmp")
    Files.write(tmp, body)
    try {
      var attempts = 0
      while (attempts < 100) {
        val next = 1L + Option(log.listFiles()).getOrElse(Array.empty)
          .flatMap(f => "([0-9]{20})\\.json".r
            .unapplySeq(f.getName).map(_.head.toLong))
          .maxOption.getOrElse(-1L)
        val slot = new File(log, f"$next%020d.json").toPath
        try {
          Files.createLink(slot, tmp)
          if (checkpointInterval > 0 && next > 0 &&
              next % checkpointInterval == 0) {
            // best-effort: the commit is already durable, and a table
            // without this checkpoint is merely slower to snapshot
            try checkpoint(df.sparkSession, tablePath, next)
            catch { case e: Exception => System.err.println(
              s"delta checkpoint at $next failed (table stays valid): $e") }
          }
          return next
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => attempts += 1
        }
      }
      throw new IllegalStateException(
        s"could not claim a commit slot in $log after 100 attempts")
    } finally {
      Files.deleteIfExists(tmp); ()
    }
  }

  /** Land a CLASSIC checkpoint for `version`: one parquet file
    * `_delta_log/%020d.checkpoint.parquet` holding the replayed state
    * (one `protocol` row, one `metaData` row, one `add` row per
    * active file — raw log paths and deletion-vector descriptors
    * reproduced verbatim, `dataChange` false per the protocol), plus
    * `_last_checkpoint` so readers can skip the log listing. Both
    * this engine's reader (checkpoint-seeded replay) and delta-spark
    * consume it; pre-checkpoint commits become vacuumable.
    *
    * Concurrency: the parquet stages under a dot-dir and MOVES into
    * the deterministic name — two racers write identical content, so
    * whichever lands is correct; `_last_checkpoint` is a move-over
    * (its readers tolerate staleness by design). */
  def checkpoint(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, version: Long): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = DeltaLakeRead.state(spark, tablePath, Some(version))
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)) ++
      (if (st.readerFeatures.nonEmpty)
        Seq(StructField("readerFeatures", ArrayType(StringType)))
       else Nil) ++
      (if (st.writerFeatures.nonEmpty)
        Seq(StructField("writerFeatures", ArrayType(StringType)))
       else Nil))
    val cpSchema = StructType(Seq(
      StructField("protocol", protoType),
      StructField("metaData", metaType),
      StructField("add", addType)))
    val protoRow = Row.fromSeq(
      Seq(st.minReader, st.minWriter) ++
      (if (st.readerFeatures.nonEmpty) Seq(st.readerFeatures) else Nil) ++
      (if (st.writerFeatures.nonEmpty) Seq(st.writerFeatures) else Nil))
    val metaRow = Row(st.metaId, Row("parquet", Map.empty[String, String]),
      st.schema.json, st.partitionColumns, st.config,
      st.createdTime.map(Long.box).orNull)
    val rows: Seq[Row] =
      Seq(Row(protoRow, null, null), Row(null, metaRow, null)) ++
      st.files.map { f =>
        val pv = f.partitionValues.map { case (k, v) => k -> v.orNull }
        val dv = f.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(Int.box).orNull, d.sizeInBytes, d.cardinality))
          .orNull
        Row(null, null,
          Row(f.rawPath, pv, f.size, f.modificationTime, false, dv))
      }
    val root = new File(tablePath)
    val log = new File(root, "_delta_log")
    val stage = new File(root, s".cp-stage-${java.util.UUID.randomUUID()}")
    spark.createDataFrame(rows.asJava, cpSchema).coalesce(1)
      .write.parquet(stage.getPath)
    val part = Option(stage.listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"checkpoint stage $stage produced no parquet part"))
    val dest = new File(log, f"$version%020d.checkpoint.parquet")
    Files.move(part.toPath, dest.toPath,
      StandardCopyOption.REPLACE_EXISTING)
    rmTree(stage)
    val lcTmp = Files.createTempFile(log.toPath, ".lc", ".tmp")
    Files.write(lcTmp,
      s"""{"version":$version,"size":${rows.size}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(lcTmp, new File(log, "_last_checkpoint").toPath,
      StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def rmTree(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }
}
