package graft

import graft.ingest.{DeltaLakeDml, DeltaLakeRead, DeltaLakeWrite}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** [[DeltaLakeDml]] — DELETE/UPDATE/upsert on real Delta tables via
  * deletion-vector emission, round-tripped through [[DeltaLakeRead]]
  * and the checkpoint path (no delta-spark on the classpath; the
  * on-disk shape is pinned to PROTOCOL.md instead). */
class DeltaDmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newTable(): String = {
    val d = Files.createTempDirectory("delta_dml").toFile
    d.deleteOnExit(); d.getPath
  }

  private def ids(t: String): Seq[Long] =
    DeltaLakeRead.snapshot(spark, t)
      .select("id").as[Long].collect().sorted.toSeq

  test("DELETE masks matching rows with a DV, upgrades the protocol " +
      "to (3,7)+deletionVectors with legacy-implied features, and " +
      "pins delta.enableDeletionVectors") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 10L).map(i => (i, s"v$i"))
      .toDF("id", "v"), t)
    val r = DeltaLakeDml.delete(spark, t, "id % 3 = 0")
    assert(r.version === 1L)
    assert(r.rowsDeleted === 4L) // 0,3,6,9
    assert(r.rowsInserted === 0L)
    assert(ids(t) === Seq(1L, 2L, 4L, 5L, 7L, 8L))
    val st = DeltaLakeRead.state(spark, t)
    assert(st.minReader === 3 && st.minWriter === 7)
    assert(st.readerFeatures.contains("deletionVectors"))
    assert(st.writerFeatures.contains("deletionVectors"))
    // legacy minWriter=2 implied features carried forward
    assert(st.writerFeatures.contains("appendOnly"))
    assert(st.writerFeatures.contains("invariants"))
    assert(st.config.get("delta.enableDeletionVectors") === Some("true"))
    assert(st.files.exists(_.dv.isDefined))
    assert(st.tombstones.nonEmpty, "the pre-DV add must be tombstoned")
    // no-match delete is a no-op, no empty commit
    val r2 = DeltaLakeDml.delete(spark, t, "id > 100")
    assert(r2.version === 1L && r2.rowsDeleted === 0L)
    assert(DeltaLakeRead.latestVersion(t) === 1L)
  }

  test("a second DELETE on the same file UNIONS its DV (descriptors " +
      "are absolute); checkCardinality read stays green") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 8L).map(i => (i, "x"))
      .toDF("id", "v").repartition(1), t)
    DeltaLakeDml.delete(spark, t, "id = 1")
    DeltaLakeDml.delete(spark, t, "id = 5")
    val st = DeltaLakeRead.state(spark, t)
    assert(st.files.map(_.dv.get.cardinality).sum === 2L)
    spark.conf.set("spark.graft.dv.checkCardinality", "true")
    try assert(ids(t) === Seq(0L, 2L, 3L, 4L, 6L, 7L))
    finally spark.conf.unset("spark.graft.dv.checkCardinality")
  }

  test("a fully-emptied file gets a bare remove, not an all-rows DV") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "en"), (2L, "en")).toDF("id", "lang")
      .repartition(1), t, partitionBy = Seq("lang"))
    DeltaLakeWrite.append(Seq((3L, "de")).toDF("id", "lang"), t,
      partitionBy = Seq("lang"))
    DeltaLakeDml.delete(spark, t, "lang = 'de'")
    val st = DeltaLakeRead.state(spark, t)
    assert(st.files.size === 1, "the de file must be gone entirely")
    assert(st.files.head.dv.isEmpty)
    assert(st.tombstones.exists(_.path.contains("lang=de")))
    // tombstone carries partition values for checkpoint re-emission
    assert(st.tombstones.find(_.path.contains("lang=de")).get
      .partitionValues.get("lang").flatten === Some("de"))
    assert(ids(t) === Seq(1L, 2L))
  }

  test("UPDATE rewrites matched rows into new files and DV-deletes " +
      "the originals; expressions see the OLD row") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 6L).map(i => (i, i * 10L))
      .toDF("id", "amt"), t)
    val r = DeltaLakeDml.update(spark, t, "id >= 4",
      Map("amt" -> "amt + id"))
    assert(r.rowsDeleted === 2L && r.rowsInserted === 2L)
    val got = DeltaLakeRead.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L),
      (4L, 44L), (5L, 55L)))
  }

  test("upsert: WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT " +
      "ALL on keys; duplicate source keys reject") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c", 30L)).toDF("id", "v", "amt"), t)
    val src = Seq((2L, "B2", 200L), (9L, "NEW", 900L))
      .toDF("id", "v", "amt")
    val r = DeltaLakeDml.upsert(spark, t, src, Seq("id"))
    assert(r.rowsDeleted === 1L && r.rowsInserted === 2L)
    val got = DeltaLakeRead.snapshot(spark, t)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10L), (2L, "B2", 200L), (3L, "c", 30L),
      (9L, "NEW", 900L)))
    val dup = Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("id", "v", "amt")
    val e = intercept[IllegalArgumentException] {
      DeltaLakeDml.upsert(spark, t, dup, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // missing columns reject too (update-all needs the full set)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLakeDml.upsert(spark, t, Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    }
    assert(e2.getMessage.contains("full column set"))
  }

  test("DML on a column-mapped (name mode) table: condition runs on " +
      "LOGICAL columns, rewrites stage physical") {
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
      f("id", LongType, "col-m1", 1L),
      f("v", StringType, "col-m2", 2L)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cmdml","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    DeltaLakeWrite.append((0L until 6L).map(i => (i, s"v$i"))
      .toDF("id", "v"), t)
    DeltaLakeDml.delete(spark, t, "id IN (0, 2)")
    DeltaLakeDml.upsert(spark, t,
      Seq((4L, "UP"), (9L, "INS")).toDF("id", "v"), Seq("id"))
    val got = DeltaLakeRead.snapshot(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "v1"), (3L, "v3"), (4L, "UP"), (5L, "v5"),
      (9L, "INS")))
    // protocol upgrade preserved the columnMapping capability
    val st = DeltaLakeRead.state(spark, t)
    assert(st.readerFeatures.contains("columnMapping"))
    assert(st.writerFeatures.contains("columnMapping"))
  }

  test("DML + CDF on a column-mapped ID-MODE table: conditions on " +
      "logical columns, rewrites and change files stage with parquet " +
      "field ids, the diff reads back logically") {
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
      f("id", LongType, "col-i1", 1L),
      f("v", StringType, "col-i2", 2L)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cmid","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.enableChangeDataFeed":"true"}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    DeltaLakeWrite.append((0L until 6L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)
    DeltaLakeDml.delete(spark, t, "id IN (0, 2)")
    DeltaLakeDml.upsert(spark, t,
      Seq((4L, "UP"), (9L, "INS")).toDF("id", "v"), Seq("id"))
    val got = DeltaLakeRead.snapshot(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "v1"), (3L, "v3"), (4L, "UP"), (5L, "v5"),
      (9L, "INS")))
    // the staged change files carry PHYSICAL names + field ids
    val cd = new java.io.File(t, "_change_data")
    assert(cd.isDirectory, "CDF-enabled DML must stage change files")
    val cdPart = cd.listFiles().find(_.getName.endsWith(".parquet")).get
    val cdSchema = spark.read.parquet(cdPart.getPath).schema
    assert(cdSchema.fieldNames.toSet ===
      Set("col-i1", "col-i2", graft.ingest.DeltaLakeCdf.ChangeTypeCol))
    assert(cdSchema("col-i1").metadata.contains("parquet.field.id"))
    // and the CDF reader restores logical names + change typing
    // (from version 2: the append at v1 is its own 6-row insert set)
    val changes = graft.ingest.DeltaLakeCdf.changes(spark, t, 2L)
    val byType = changes.groupBy(graft.ingest.DeltaLakeCdf.ChangeTypeCol)
      .count().as[(String, Long)].collect().toMap
    assert(byType === Map("delete" -> 2L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
    assert(changes.filter(org.apache.spark.sql.functions.col(
        graft.ingest.DeltaLakeCdf.ChangeTypeCol) === "insert")
      .select("id", "v").as[(Long, String)]
      .collect().toSeq === Seq((9L, "INS")))
  }

  test("checkpoint AFTER DML: DV descriptors and tombstones survive " +
      "the checkpoint; snapshot correct after vacuuming all commits") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 10L).map(i => (i, s"v$i"))
      .toDF("id", "v"), t)
    DeltaLakeDml.delete(spark, t, "id % 2 = 1")
    val v = DeltaLakeDml.upsert(spark, t,
      Seq((4L, "UP"), (20L, "INS")).toDF("id", "v"), Seq("id")).version
    DeltaLakeWrite.checkpoint(spark, t, v)
    val log = new java.io.File(t, "_delta_log")
    (0L to v).foreach { i =>
      Files.delete(new java.io.File(log, f"$i%020d.json").toPath)
    }
    assert(ids(t) === Seq(0L, 2L, 4L, 6L, 8L, 20L))
    val got = DeltaLakeRead.snapshot(spark, t).filter("id = 4")
      .select("v").as[String].collect().toSeq
    assert(got === Seq("UP"))
    assert(DeltaLakeRead.state(spark, t).tombstones.nonEmpty)
  }

  test("DML on a partitioned table keeps partitionValues on the " +
      "remove/add pair and appends respect partitioning") {
    val t = newTable()
    DeltaLakeWrite.append(
      Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
        .toDF("id", "lang").repartition(1), t, partitionBy = Seq("lang"))
    DeltaLakeDml.update(spark, t, "id = 3", Map("id" -> "id + 100"))
    val st = DeltaLakeRead.state(spark, t)
    val dvFile = st.files.find(_.dv.isDefined).get
    assert(dvFile.partitionValues.get("lang").flatten === Some("de"))
    assert(ids(t) === Seq(1L, 2L, 4L, 103L))
    // the rewritten row landed under its hive dir
    assert(DeltaLakeRead.snapshot(spark, t)
      .filter("lang = 'de'").select("id").as[Long].collect().sorted
      .toSeq === Seq(4L, 103L))
  }

  test("upsert on duplicate TARGET keys follows MERGE UPDATE ALL: " +
      "every matched target row lands a postimage copy, count kept") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a", 10L), (2L, "b", 20L),
      (2L, "b2", 21L), (3L, "c", 30L)).toDF("id", "v", "amt"), t)
    val src = Seq((2L, "U", 200L), (9L, "N", 900L))
      .toDF("id", "v", "amt")
    val r = DeltaLakeDml.upsert(spark, t, src, Seq("id"))
    // both id=2 target rows DV-deleted, BOTH replaced (not collapsed)
    assert(r.rowsDeleted === 2L)
    assert(r.rowsInserted === 3L) // 2 postimages for id=2 + 1 insert
    val got = DeltaLakeRead.snapshot(spark, t)
      .as[(Long, String, Long)].collect().sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq((1L, "a", 10L), (2L, "U", 200L), (2L, "U", 200L),
      (3L, "c", 30L), (9L, "N", 900L)))
  }

  test("protocol upgrade on a table ALREADY at table-features does " +
      "not re-imply legacy feature sets, only adds deletionVectors") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 4L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)
    // hand-commit v1: the table moves to minWriter=7 declaring ONLY
    // invariants — the features it actually uses
    val log = new java.io.File(t, "_delta_log")
    Files.write(new java.io.File(log, f"${1L}%020d.json").toPath,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["invariants"]}}"""
        .getBytes("UTF-8"))
    DeltaLakeDml.delete(spark, t, "id = 0")
    val st = DeltaLakeRead.state(spark, t)
    assert(st.minReader === 3 && st.minWriter === 7)
    assert(st.writerFeatures.toSet ===
      Set("invariants", "deletionVectors"),
      "legacy-implied features (checkConstraints, columnMapping, ...) " +
      "must NOT appear — the table never declared them")
    assert(st.readerFeatures.toSet === Set("deletionVectors"))
    assert(ids(t) === Seq(1L, 2L, 3L))
  }

  test("DML runs the replacement-row plan ONCE: rowsInserted comes " +
      "from staged parquet footers, not a second source scan") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 100L).map(i => (i, i * 10L))
      .toDF("id", "amt").repartition(1), t)
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        var prev = -1; var spins = 0
        while (prev != n.get() && spins < 20) {
          prev = n.get(); Thread.sleep(100); spins += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    // an UPDATE is exactly three Spark jobs: the matched-position
    // aggregation collect, the executor-side DV-write collect, and
    // the staging write of the rewritten rows. The old
    // `inserting.get.count()` re-ran the rewrite plan (snapshot scan
    // + filter) as a FOURTH job per DML call — pin it gone.
    val r = new java.util.concurrent.atomic.AtomicReference[
      DeltaLakeDml.DmlResult]()
    val jobs = countJobs {
      r.set(DeltaLakeDml.update(spark, t, "id >= 90",
        Map("amt" -> "amt + 1")))
    }
    assert(r.get().rowsDeleted === 10L && r.get().rowsInserted === 10L)
    assert(jobs <= 3, s"UPDATE launched $jobs jobs — the rewrite plan " +
      "must not run a second time for the insert count")
  }

  test("CONCURRENT DML serializes by recompute: racing disjoint " +
      "DELETEs on the same file both land, none lost") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 100L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    def race(cond: String) = pool.submit(
      new java.util.concurrent.Callable[DeltaLakeDml.DmlResult] {
        def call() = { go.await(); DeltaLakeDml.delete(spark, t, cond) }
      })
    val a = race("id < 10")
    val b = race("id >= 90")
    go.countDown()
    val (ra, rb) = (a.get(), b.get())
    pool.shutdown()
    assert(ra.rowsDeleted === 10L && rb.rowsDeleted === 10L)
    assert(Set(ra.version, rb.version) === Set(1L, 2L),
      "the loser must recompute and land at the next version")
    assert(ids(t) === (10L until 90L).toSeq,
      "BOTH deletes must be applied — a lost update would resurrect " +
      "one side's rows")
    // the surviving DV carries the union of both deletes
    val st = DeltaLakeRead.state(spark, t)
    assert(st.files.map(_.dv.get.cardinality).sum === 20L)
  }

  test("an APPEND landing in the commit window is benign: the DML " +
      "slides to the next slot without recomputing (WriteSerializable)") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 10L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)
    // one-shot hook: an append lands AFTER the delete computed its
    // DVs against version 0 but BEFORE it claims a slot
    DeltaLakeDml.testBeforeCommit = () => {
      DeltaLakeDml.testBeforeCommit = () => ()
      DeltaLakeWrite.append(Seq((100L, "x")).toDF("id", "v"), t); ()
    }
    try {
      val r = DeltaLakeDml.delete(spark, t, "id = 0")
      assert(r.version === 2L,
        "slot 1 was the append's; the DML must slide to 2, not fail")
      assert(r.rowsDeleted === 1L)
    } finally DeltaLakeDml.testBeforeCommit = () => ()
    assert(ids(t) === ((1L until 10L) :+ 100L))
  }

  test("a conflicting mutation in the commit window forces recompute " +
      "(both apply); with maxRetries=0 the loser aborts loudly and " +
      "leaks nothing") {
    val t = newTable()
    DeltaLakeWrite.append((0L until 10L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)
    // recompute path: a delete of id=2 lands in id=1's commit window
    DeltaLakeDml.testBeforeCommit = () => {
      DeltaLakeDml.testBeforeCommit = () => ()
      DeltaLakeDml.delete(spark, t, "id = 2"); ()
    }
    try {
      val r = DeltaLakeDml.delete(spark, t, "id = 1")
      assert(r.version === 2L && r.rowsDeleted === 1L)
    } finally DeltaLakeDml.testBeforeCommit = () => ()
    assert(ids(t) === Seq(0L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
      "both the window mutation and the recomputed one must apply")
    assert(DeltaLakeRead.state(spark, t).files
      .map(_.dv.get.cardinality).sum === 2L)
    // loud abort: same shape, zero retries
    spark.conf.set("spark.graft.delta.dml.maxRetries", "0")
    DeltaLakeDml.testBeforeCommit = () => {
      DeltaLakeDml.testBeforeCommit = () => ()
      DeltaLakeDml.delete(spark, t, "id = 4"); ()
    }
    try {
      val e = intercept[IllegalStateException] {
        DeltaLakeDml.delete(spark, t, "id = 3")
      }
      assert(e.getMessage.contains("giving up after 0 recomputes"))
    } finally {
      DeltaLakeDml.testBeforeCommit = () => ()
      spark.conf.unset("spark.graft.delta.dml.maxRetries")
    }
    // the window's delete DID land; the aborted one did not
    assert(ids(t) === Seq(0L, 3L, 5L, 6L, 7L, 8L, 9L))
    // the aborted attempt left no stray DV bin: every .bin on disk is
    // referenced by the current snapshot or a tombstone
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        case x if x.isDirectory && x.getName == "_delta_log" => Nil
        case x if x.isDirectory => walk(x)
        case f if f.getName.endsWith(".bin") => Seq(f)
        case _ => Nil
      }
    val st = DeltaLakeRead.state(spark, t)
    val referenced = (st.files.flatMap(_.dv) ++
      st.tombstones.flatMap(_.dv)).map(d =>
      graft.ingest.DeletionVectors.resolvePath(new java.io.File(t), d)
        .getCanonicalPath).toSet
    val stray = walk(new java.io.File(t))
      .filterNot(f => referenced.contains(f.getCanonicalPath))
    assert(stray.isEmpty, s"aborted attempt leaked DV bins: $stray")
  }

  test("appendOnly tables refuse DML") {
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a")).toDF("id", "v"), t)
    val log = new java.io.File(t, "_delta_log")
    val st0 = DeltaLakeRead.state(spark, t)
    Files.write(new java.io.File(log, f"${1L}%020d.json").toPath,
      DeltaLakeWrite.metaDataJson(st0.metaId, st0.schema.json, Nil,
        Map("delta.appendOnly" -> "true"), None).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeDml.delete(spark, t, "id = 1")
    }
    assert(e.getMessage.contains("appendOnly"))
  }
}
