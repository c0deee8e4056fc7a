package graft

import graft.ingest.{DeltaLakeCdf, DeltaLakeDml, DeltaLakeRead, DeltaLakeWrite}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Change Data Feed: [[DeltaLakeDml]] writes `_change_data` files +
  * cdc actions when `delta.enableChangeDataFeed=true`;
  * [[DeltaLakeCdf.changes]] reads row-level diffs back — both pinned
  * to PROTOCOL.md § Add CDC File. */
class DeltaCdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Cdf = Map("delta.enableChangeDataFeed" -> "true")

  private def newTable(): String = {
    val d = Files.createTempDirectory("delta_cdf").toFile
    d.deleteOnExit(); d.getPath
  }

  private def changeSet(t: String, from: Long,
      to: Option[Long] = None): Set[(Long, String, String, Long)] =
    DeltaLakeCdf.changes(spark, t, from, to)
      .select("id", "v", DeltaLakeCdf.ChangeTypeCol,
        DeltaLakeCdf.CommitVersionCol)
      .as[(Long, String, String, Long)].collect().toSet

  test("DML on a CDF table lands _change_data files + cdc actions; " +
      "changes() returns typed per-verb rows; appends derive inserts") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v"), t, tableConfig = Cdf) // v0
    DeltaLakeDml.delete(spark, t, "id = 2")   // v1
    DeltaLakeDml.update(spark, t, "id = 3", Map("v" -> "'C'")) // v2
    DeltaLakeDml.upsert(spark, t,
      Seq((1L, "A2"), (9L, "new")).toDF("id", "v"), Seq("id")) // v3
    DeltaLakeWrite.append(Seq((4L, "d")).toDF("id", "v"), t,
      tableConfig = Cdf) // v4 — pure append, insert derived from adds
    // on-disk shape: cdc files under _change_data, cdc actions in logs
    assert(new java.io.File(t, "_change_data").isDirectory)
    val v1 = new String(Files.readAllBytes(new java.io.File(t,
      f"_delta_log/${1L}%020d.json").toPath))
    assert(v1.contains("\"cdc\"") && v1.contains("_change_data/"))
    assert(changeSet(t, 1L, Some(1L)) === Set((2L, "b", "delete", 1L)))
    assert(changeSet(t, 2L, Some(2L)) === Set(
      (3L, "c", "update_preimage", 2L),
      (3L, "C", "update_postimage", 2L)))
    assert(changeSet(t, 3L, Some(3L)) === Set(
      (1L, "a", "update_preimage", 3L),
      (1L, "A2", "update_postimage", 3L),
      (9L, "new", "insert", 3L)))
    assert(changeSet(t, 4L) === Set((4L, "d", "insert", 4L)))
    // the whole range at once, including the v0 insert derivation
    assert(changeSet(t, 0L).count(_._3 == "insert") === 5)
    // snapshot is unaffected by the cdc files (they are NOT data)
    assert(DeltaLakeRead.snapshot(spark, t).select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 4L, 9L))
  }

  test("a pre-CDF DML commit in the range rejects loudly — its " +
      "deletes cannot be derived from the log") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    DeltaLakeDml.delete(spark, t, "id = 1") // v1, NO cdc (CDF off)
    // enable CDF afterwards (metaData-only commit v2)
    val st = DeltaLakeRead.state(spark, t)
    val log = new java.io.File(t, "_delta_log")
    Files.write(new java.io.File(log, f"${2L}%020d.json").toPath,
      DeltaLakeWrite.metaDataJson(st.metaId, st.schema.json, Nil,
        st.config + ("delta.enableChangeDataFeed" -> "true"), None)
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeCdf.changes(spark, t, 1L)
    }
    assert(e.getMessage.contains("without change-data"))
    // but the post-enablement slice reads fine (v2 is metadata-only)
    assert(DeltaLakeCdf.changes(spark, t, 2L).count() === 0L)
    // and a table that never enabled CDF refuses up front
    val t2 = newTable()
    DeltaLakeWrite.append(Seq((1L, "a")).toDF("id", "v"), t2)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLakeCdf.changes(spark, t2, 0L)
    }
    assert(e2.getMessage.contains("enableChangeDataFeed"))
  }

  test("CDF on a PARTITIONED table: change files land under hive " +
      "dirs, partition columns come back from partitionValues") {
    val t = newTable()
    DeltaLakeWrite.append(
      Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
        .toDF("id", "lang").repartition(1), t,
      partitionBy = Seq("lang"), tableConfig = Cdf)
    DeltaLakeDml.delete(spark, t, "id = 3")
    val ch = DeltaLakeCdf.changes(spark, t, 1L)
      .select("id", "lang", DeltaLakeCdf.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((3L, "de", "delete")))
    assert(new java.io.File(t, "_change_data/lang=de").isDirectory,
      "cdc files must respect the table's partitioning")
  }

  test("CDF on a column-mapped (name mode) table: change files carry " +
      "PHYSICAL column names + a literal _change_type; reader " +
      "restores logical names") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    def f(logical: String, dt: DataType, phys: String,
        id: Long): StructField =
      StructField(logical, dt, nullable = true,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", phys)
          .putLong("delta.columnMapping.id", id).build())
    val schema = StructType(Seq(
      f("id", LongType, "col-c1", 1L),
      f("v", StringType, "col-c2", 2L)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cdfcm","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.enableChangeDataFeed":"true"}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    DeltaLakeWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    DeltaLakeDml.update(spark, t, "id = 2", Map("v" -> "upper(v)"))
    val ch = DeltaLakeCdf.changes(spark, t, 2L)
      .select("id", "v", DeltaLakeCdf.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((2L, "b", "update_preimage"),
      (2L, "B", "update_postimage")))
    // the cdc parquet itself is physical-named + _change_type
    val cdcPart = new java.io.File(t, "_change_data").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(spark.read.parquet(cdcPart.getPath).columns.toSet ===
      Set("col-c1", "col-c2", "_change_type"))
  }

  test("changes() across a CHECKPOINT-SEEDED replay: pre-range " +
      "commits may be vacuumed (state seeds from the checkpoint); a " +
      "vacuumed commit INSIDE the range is loud") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 6L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t,
      tableConfig = Map("delta.enableChangeDataFeed" -> "true")) // v0
    DeltaLakeDml.delete(spark, t, "id = 1")                      // v1
    DeltaLakeWrite.append(Seq((10L, "x")).toDF("id", "v"), t)    // v2
    DeltaLakeDml.update(spark, t, "id = 10",
      Map("v" -> "upper(v)"))                                    // v3
    DeltaLakeWrite.checkpoint(spark, t, 2L)
    val log = new java.io.File(t, "_delta_log")
    Seq(0L, 1L, 2L).foreach { v =>
      Files.delete(new java.io.File(log, f"$v%020d.json").toPath)
    }
    // range [3,3]: its commit exists, state comes from the checkpoint
    val ch = DeltaLakeCdf.changes(spark, t, 3L)
      .select("id", "v", DeltaLakeCdf.ChangeTypeCol)
      .as[(Long, String, String)].collect().toSet
    assert(ch === Set((10L, "x", "update_preimage"),
      (10L, "X", "update_postimage")))
    // a range reaching into the vacuumed prefix cannot be served
    val e = intercept[IllegalArgumentException] {
      DeltaLakeCdf.changes(spark, t, 1L)
    }
    assert(e.getMessage.contains("missing"))
  }
}
