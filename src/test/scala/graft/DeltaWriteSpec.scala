package graft

import graft.ingest.{DeltaLakeRead, DeltaLakeWrite}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** [[DeltaLakeWrite]] round-trips through [[DeltaLakeRead]] — the two
  * halves of the interop surface verified against each other and the
  * on-disk protocol shape (the classpath has no delta-spark to
  * cross-check against; the log deliberately uses only protocol (1,2)
  * actions for that reason). */
class DeltaWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newTable(): String = {
    val d = Files.createTempDirectory("delta_write").toFile
    d.deleteOnExit(); d.getPath
  }

  test("create + two appends: versions 0/1, snapshot unions, time " +
      "travel sees each increment") {
    val t = newTable()
    assert(DeltaLakeWrite.append(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) === 0L)
    assert(DeltaLakeWrite.append(Seq((3L, "c")).toDF("id", "v"), t) === 1L)
    def ids(v: Option[Long]) = DeltaLakeRead.snapshot(spark, t, v)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(None) === Seq(1L, 2L, 3L))
    assert(ids(Some(0L)) === Seq(1L, 2L))
    // on-disk shape: exactly the protocol files a Delta reader expects
    val log = new java.io.File(t, "_delta_log").listFiles().map(_.getName)
    assert(log.sorted.toSeq ===
      Seq("00000000000000000000.json", "00000000000000000001.json"))
    val v0 = Files.readAllLines(java.nio.file.Paths.get(
      t, "_delta_log", "00000000000000000000.json"))
    assert(v0.get(0).contains("\"minReaderVersion\":1"))
    assert(v0.get(1).contains("schemaString"))
  }

  test("partitioned append lands hive-style dirs + matching " +
      "partitionValues; reader restores the column") {
    val t = newTable()
    DeltaLakeWrite.append(
      Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang"), t,
      partitionBy = Seq("lang"))
    val got = DeltaLakeRead.snapshot(spark, t)
      .select("id", "lang").as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "en"), (2L, "de"), (3L, "en")).sorted)
    assert(new java.io.File(t, "lang=en").isDirectory)
    val st = DeltaLakeRead.state(spark, t)
    assert(st.partitionColumns === Seq("lang"))
    assert(st.files.forall(f =>
      f.partitionValues.get("lang").flatten.isDefined))
  }

  test("append validates against the existing table: schema drift, " +
      "partitioning drift, unescapable partition values all reject") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "en")).toDF("id", "lang"), t,
      partitionBy = Seq("lang"))
    intercept[IllegalArgumentException] { // wrong partitioning
      DeltaLakeWrite.append(Seq((2L, "de")).toDF("id", "lang"), t)
    }
    intercept[IllegalArgumentException] { // wrong schema
      DeltaLakeWrite.append(Seq((2, "de")).toDF("id", "lang"), t,
        partitionBy = Seq("lang"))
    }
    intercept[IllegalArgumentException] { // value needs escaping
      DeltaLakeWrite.append(Seq((2L, "d e")).toDF("id", "lang"), t,
        partitionBy = Seq("lang"))
    }
  }

  test("append refuses a column-mapped table (its parquet carries " +
      "physical names this writer does not stage)") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    val f = StructField("id", LongType, nullable = true,
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", "col-z1")
        .putLong("delta.columnMapping.id", 1L).build())
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(StructType(Seq(f)).json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cm","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), t)
    }
    assert(e.getMessage.contains("column-mapped"))
  }

  test("append refuses tables whose write constraints it cannot " +
      "enforce: unknown writer features, CHECK constraints, " +
      "generated columns") {
    import org.apache.spark.sql.types._
    def mkTable(proto: String, conf: String, schema: StructType): String = {
      val t = newTable()
      val log = new java.io.File(t, "_delta_log"); log.mkdirs()
      val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(schema.json)
      Files.write(
        new java.io.File(log, "00000000000000000000.json").toPath,
        (Seq(proto,
          s"""{"metaData":{"id":"w","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":$conf}}""")
          .mkString("\n")).getBytes("UTF-8"))
      t
    }
    val plain = StructType(Seq(StructField("id", LongType)))
    val e1 = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), mkTable(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""",
        "{}", plain))
    }
    assert(e1.getMessage.contains("unsupported Delta writer features"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), mkTable(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
        """{"delta.constraints.idpos":"id > 0"}""", plain))
    }
    assert(e2.getMessage.contains("CHECK constraints"))
    val gen = StructType(Seq(StructField("id", LongType, nullable = true,
      new MetadataBuilder()
        .putString("delta.generationExpression", "1 + 1").build())))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), mkTable(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        "{}", gen))
    }
    assert(e3.getMessage.contains("generationExpression"))
    // appendOnly + CDF constrain nothing an append violates → pass
    val ok = mkTable(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","changeDataFeed"]}}""",
      """{"delta.appendOnly":"true"}""", plain)
    assert(DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), ok) === 1L)
  }

  test("snapshot reads stay plain parquet relations: data filters " +
      "reach PushedFilters, partition filters prune the listing") {
    val t = newTable()
    DeltaLakeWrite.append(
      (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
        .toDF("id", "lang"), t, partitionBy = Seq("lang"))
    val df = DeltaLakeRead.snapshot(spark, t)
      .filter($"lang" === "en" && $"id" > 50L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(id,50)"),
      s"data predicate must reach the parquet scan:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition predicate must prune directories:\n$plan")
    assert(df.count() === 25L)
  }

  test("checkpoint cadence: a 25-commit table lands classic " +
      "checkpoints + _last_checkpoint, and snapshots survive the " +
      "pre-checkpoint commits being vacuumed away") {
    val t = newTable()
    (0 until 25).foreach { i =>
      DeltaLakeWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), t)
    }
    val log = new java.io.File(t, "_delta_log")
    val names = log.listFiles().map(_.getName).toSet
    assert(names.contains("00000000000000000010.checkpoint.parquet"))
    assert(names.contains("00000000000000000020.checkpoint.parquet"))
    assert(names.contains("_last_checkpoint"))
    val lc = new String(Files.readAllBytes(
      new java.io.File(log, "_last_checkpoint").toPath))
    assert(lc.contains("\"version\":20"))
    // vacuum every pre-checkpoint commit: replay must seed from cp 20
    (0 until 20).foreach { v =>
      Files.delete(new java.io.File(log, f"$v%020d.json").toPath)
    }
    val ids = DeltaLakeRead.snapshot(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 25L).toSeq)
    // the checkpoint reproduced metaData faithfully
    val st = DeltaLakeRead.state(spark, t, Some(20L))
    assert(st.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(st.metaId.nonEmpty)
    assert(st.files.size === 21)
    assert(st.files.forall(_.size > 0L),
      "checkpointed adds must carry real file sizes")
  }

  test("checkpoint preserves partition values and the snapshot " +
      "still prunes after the log is truncated to the checkpoint") {
    val t = newTable()
    (0 until 12).foreach { i =>
      DeltaLakeWrite.append(
        Seq((i.toLong, if (i % 2 == 0) "en" else "de")).toDF("id", "lang"),
        t, partitionBy = Seq("lang"))
    }
    val log = new java.io.File(t, "_delta_log")
    assert(log.listFiles().map(_.getName)
      .contains("00000000000000000010.checkpoint.parquet"))
    (0 until 10).foreach { v =>
      Files.delete(new java.io.File(log, f"$v%020d.json").toPath)
    }
    val df = DeltaLakeRead.snapshot(spark, t).filter($"lang" === "en")
    assert(df.select("id").as[Long].collect().sorted.toSeq ===
      Seq(0L, 2L, 4L, 6L, 8L, 10L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition pruning must survive the checkpoint path:\n$plan")
  }

  test("concurrent appends serialize on the slot claim — distinct " +
      "versions, no lost rows") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((0L, "z")).toDF("id", "v"), t)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val vs = Await.result(Future.sequence((1 to 4).map(i => Future {
      DeltaLakeWrite.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), t)
    })), 120.seconds)
    assert(vs.toSet.size === 4, s"versions must be distinct: $vs")
    val ids = DeltaLakeRead.snapshot(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(0L, 1L, 2L, 3L, 4L))
  }
}
