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

  test("append to a column-mapped (name mode) table stages parquet " +
      "under PHYSICAL names; id mode stages field ids") {
    import org.apache.spark.sql.types._
    def cmTable(mode: String): String = {
      val t = newTable()
      val log = new java.io.File(t, "_delta_log"); log.mkdirs()
      def f(logical: String, dt: DataType, phys: String,
          id: Long): StructField =
        StructField(logical, dt, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id).build())
      val schema = StructType(Seq(
        f("id", LongType, "col-z1", 1L),
        f("lang", StringType, "col-z2", 2L)))
      val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(schema.json)
      Files.write(
        new java.io.File(log, "00000000000000000000.json").toPath,
        (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"cm","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":["lang"],"configuration":{"delta.columnMapping.mode":"$mode"}}}""")
          .mkString("\n")).getBytes("UTF-8"))
      t
    }
    val t = cmTable("name")
    import spark.implicits._
    val v = DeltaLakeWrite.append(
      Seq((1L, "en"), (2L, "de")).toDF("id", "lang"), t,
      partitionBy = Seq("lang"))
    assert(v === 1L)
    // hive dirs use the PHYSICAL partition name
    assert(new java.io.File(t, "col-z2=en").isDirectory)
    // the staged parquet carries physical column names
    val part = new java.io.File(t, "col-z2=en").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(spark.read.parquet(part.getPath).columns.toSeq ===
      Seq("col-z1"))
    // and the reader restores logical names/values
    val got = DeltaLakeRead.snapshot(spark, t)
      .select("id", "lang").as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "en"), (2L, "de")).sorted)
    // a second append keeps working against the landed state
    DeltaLakeWrite.append(Seq((3L, "en")).toDF("id", "lang"), t,
      partitionBy = Seq("lang"))
    assert(DeltaLakeRead.snapshot(spark, t).count() === 3L)
    // id mode: the staged parquet footer carries parquet field ids,
    // so the engine's own id-mode reader (field-id resolution, NOT
    // name matching) round-trips the rows
    val ti = cmTable("id")
    DeltaLakeWrite.append(Seq((9L, "fr"), (10L, "en"))
      .toDF("id", "lang"), ti, partitionBy = Seq("lang"))
    val partI = new java.io.File(ti, "col-z2=fr").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val footerSchema = spark.read.parquet(partI.getPath).schema
    assert(footerSchema.fields.map(_.name).toSeq === Seq("col-z1"))
    assert(footerSchema("col-z1").metadata.contains("parquet.field.id"),
      "id-mode staging must emit resolvable parquet field ids")
    val gotI = DeltaLakeRead.snapshot(spark, ti)
      .select("id", "lang").as[(Long, String)].collect().sorted.toSeq
    assert(gotI === Seq((9L, "fr"), (10L, "en")).sorted)
    // a log schema WITHOUT ids still refuses loudly
    val tBad = newTable()
    val logBad = new java.io.File(tBad, "_delta_log"); logBad.mkdirs()
    val noIdSchema = StructType(Seq(StructField("id", LongType,
      nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", "col-q1")
        .build())))
    val noIdStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(noIdSchema.json)
    Files.write(
      new java.io.File(logBad, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cmq","format":{"provider":"parquet","options":{}},"schemaString":$noIdStr,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), tBad)
    }
    assert(e.getMessage.contains("refusing to guess"))
  }

  test("checkpoint preserves remove tombstones, txn state, and " +
      "domainMetadata — appending to a table with delete history must " +
      "not silently discard them") {
    import spark.implicits._
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a")).toDF("id", "v"), t)
    DeltaLakeWrite.append(Seq((2L, "b")).toDF("id", "v"), t)
    // hand-commit a remove + txn + domainMetadata (as a foreign
    // writer with delete history would have)
    val st0 = DeltaLakeRead.state(spark, t)
    val victim = st0.files.head
    val log = new java.io.File(t, "_delta_log")
    val now = System.currentTimeMillis()
    Files.write(new java.io.File(log, f"${2L}%020d.json").toPath,
      (Seq(
        s"""{"remove":{"path":"${victim.rawPath}","deletionTimestamp":$now,"dataChange":true}}""",
        """{"txn":{"appId":"job-42","version":11}}""",
        """{"domainMetadata":{"domain":"owned","configuration":"cfg","removed":false}}""")
        .mkString("\n")).getBytes("UTF-8"))
    DeltaLakeWrite.checkpoint(spark, t, 2L)
    // vacuum every pre-checkpoint commit: all state must come back
    // from the checkpoint alone
    (0 to 1).foreach(v => Files.delete(
      new java.io.File(log, f"$v%020d.json").toPath))
    val st = DeltaLakeRead.state(spark, t)
    assert(st.files.size === 1)
    assert(st.tombstones.map(_.path) === Seq(victim.path))
    assert(st.tombstones.head.deletionTimestamp === Some(now))
    assert(st.txns === Map("job-42" -> 11L))
    assert(st.domains ===
      Seq(DeltaLakeRead.DomainMetadata("owned", "cfg", false)))
    // and the snapshot still reads the surviving file
    assert(DeltaLakeRead.snapshot(spark, t).count() === 1L)
  }

  test("checkpoint EXPIRES tombstones past " +
      "delta.deletedFileRetentionDuration but keeps fresh ones") {
    import spark.implicits._
    val t = newTable()
    DeltaLakeWrite.append(Seq((1L, "a")).toDF("id", "v"), t)
    val st0 = DeltaLakeRead.state(spark, t)
    val log = new java.io.File(t, "_delta_log")
    val old = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    Files.write(new java.io.File(log, f"${1L}%020d.json").toPath,
      s"""{"remove":{"path":"${st0.files.head.rawPath}","deletionTimestamp":$old,"dataChange":true}}"""
        .getBytes("UTF-8"))
    DeltaLakeWrite.checkpoint(spark, t, 1L)
    Files.delete(new java.io.File(log, f"${0L}%020d.json").toPath)
    assert(DeltaLakeRead.state(spark, t).tombstones.isEmpty,
      "a week-old tombstone must not survive the default retention")
    // retention parser: explicit config shapes
    assert(DeltaLakeWrite.tombstoneRetentionMs(Map.empty) ===
      7L * 24 * 3600 * 1000)
    assert(DeltaLakeWrite.tombstoneRetentionMs(Map(
      "delta.deletedFileRetentionDuration" -> "interval 2 days")) ===
      2L * 24 * 3600 * 1000)
    assert(DeltaLakeWrite.tombstoneRetentionMs(Map(
      "delta.deletedFileRetentionDuration" -> "interval 1 hour")) ===
      3600L * 1000)
  }

  test("MULTI-PART checkpoint write: parts land under the protocol " +
      "names, _last_checkpoint records parts, reader unions them " +
      "after vacuum") {
    import spark.implicits._
    val t = newTable()
    (0 until 5).foreach { i =>
      DeltaLakeWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), t,
        checkpointInterval = 0)
    }
    DeltaLakeWrite.checkpoint(spark, t, 4L, parts = Some(3))
    val log = new java.io.File(t, "_delta_log")
    val names = log.listFiles().map(_.getName).toSet
    (1 to 3).foreach { p =>
      assert(names.contains(
        f"${4L}%020d.checkpoint.$p%010d.${3}%010d.parquet"))
    }
    val lc = new String(Files.readAllBytes(
      new java.io.File(log, "_last_checkpoint").toPath))
    assert(lc.contains("\"parts\":3"))
    (0 until 4).foreach(v => Files.delete(
      new java.io.File(log, f"$v%020d.json").toPath))
    val ids = DeltaLakeRead.snapshot(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 5L).toSeq)
  }

  test("writer-honesty gate recurses into NESTED fields: an invariant " +
      "on a struct member rejects the append") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    val nested = StructType(Seq(
      StructField("x", LongType, nullable = true,
        new MetadataBuilder()
          .putString("delta.invariants", "x > 0").build())))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", nested)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"n","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "x")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("x")).as("payload"))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(df, t)
    }
    assert(e.getMessage.contains("delta.invariants"))
    assert(e.getMessage.contains("payload.x"))
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
    // generated columns are now ENFORCED, not refused: a provided
    // value that diverges from the expression aborts
    val gen = StructType(Seq(StructField("id", LongType, nullable = true,
      new MetadataBuilder()
        .putString("delta.generationExpression", "1 + 1").build())))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), mkTable(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        "{}", gen))
    }
    assert(e3.getMessage.contains("diverge"))
    // NESTED obligations stay refused (no enforcement path for them)
    val nested = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", LongType, nullable = true, new MetadataBuilder()
        .putString("delta.generationExpression", "1 + 1").build()))))))
    val e4 = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(
        Seq(Tuple1(Tuple1(1L))).toDF("s"), mkTable(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
          "{}", nested))
    }
    assert(e4.getMessage.contains("does not enforce it"))
    // appendOnly + CDF constrain nothing an append violates → pass
    val ok = mkTable(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","changeDataFeed"]}}""",
      """{"delta.appendOnly":"true"}""", plain)
    assert(DeltaLakeWrite.append(Seq(Tuple1(1L)).toDF("id"), ok) === 1L)
  }

  test("column obligations ENFORCED on append: invariants abort on " +
      "FALSE and on NULL (protocol invariant semantics), generated " +
      "columns compute when absent, identity allocates past the high " +
      "watermark and advances it in the same commit") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    val schema = StructType(Seq(
      StructField("rid", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", 100L)
        .putLong("delta.identity.step", 10L).build()),
      StructField("amt", LongType, nullable = true, new MetadataBuilder()
        .putString("delta.invariants",
          """{"expression":{"expression":"amt >= 0"}}""").build()),
      StructField("amt2", LongType, nullable = true, new MetadataBuilder()
        .putString("delta.generationExpression", "amt * 2").build())))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""",
        s"""{"metaData":{"id":"oblig","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    // absent rid and amt2: identity allocates 100,110,120; amt2 computes
    DeltaLakeWrite.append(Seq(5L, 7L, 9L).toDF("amt").repartition(1), t)
    val got1 = DeltaLakeRead.snapshot(spark, t)
      .select("rid", "amt", "amt2").as[(Long, Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(got1 === Seq((100L, 5L, 10L), (110L, 7L, 14L),
      (120L, 9L, 18L)))
    // the SAME commit advanced the watermark; the next append
    // continues past it
    val st1 = DeltaLakeRead.state(spark, t)
    assert(st1.schema("rid").metadata
      .getLong("delta.identity.highWaterMark") === 120L)
    DeltaLakeWrite.append(Seq(11L).toDF("amt").repartition(1), t)
    val rids = DeltaLakeRead.snapshot(spark, t)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(rids === Seq(100L, 110L, 120L, 130L))
    // NULL violates the invariant too (the protocol's Column
    // Invariants section: writers reject rows where the expression is
    // false OR null — delta-spark aborts on null; r13 ADVICE fix);
    // FALSE aborts as before
    val eNull = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq[Option[Long]](None).toDF("amt"), t)
    }
    assert(eNull.getMessage.contains("invariant"))
    val eInv = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq(-1L).toDF("amt"), t)
    }
    assert(eInv.getMessage.contains("invariant"))
    // explicit identity values refuse without allowExplicitInsert
    val eId = intercept[IllegalArgumentException] {
      DeltaLakeWrite.append(Seq((999L, 1L)).toDF("rid", "amt"), t)
    }
    assert(eId.getMessage.contains("explicit"))
    // provided generated values that MATCH pass validation
    DeltaLakeWrite.append(Seq((3L, 6L)).toDF("amt", "amt2"), t)
    // 3 + 1 + 1 rows landed; the NULL and explicit-identity appends
    // aborted without committing
    assert(DeltaLakeRead.snapshot(spark, t).count() === 5L)
  }

  test("racing identity appends never allocate duplicate ids: the " +
      "loser recomputes past the moved watermark") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    val schema = StructType(Seq(
      StructField("rid", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", 100L)
        .putLong("delta.identity.step", 10L).build()),
      StructField("amt", LongType)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""",
        s"""{"metaData":{"id":"idrace","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    def race(amts: Seq[Long]) = pool.submit(
      new java.util.concurrent.Callable[Long] {
        def call() = {
          go.await()
          DeltaLakeWrite.append(
            amts.toDF("amt").repartition(1), t)
        }
      })
    val a = race(Seq(1L, 2L, 3L)); val b = race(Seq(4L, 5L, 6L))
    go.countDown()
    a.get(); b.get()
    pool.shutdown()
    val rids = DeltaLakeRead.snapshot(spark, t)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(rids === Seq(100L, 110L, 120L, 130L, 140L, 150L),
      "a lost identity race would duplicate ids or skip the range")
    assert(DeltaLakeRead.state(spark, t).schema("rid").metadata
      .getLong("delta.identity.highWaterMark") === 150L)
  }

  test("V2 checkpoint WRITES: a v2Checkpoint-feature table gets a " +
      "UUID manifest + sidecar file actions that seed replay after " +
      "the commits are vacuumed, DVs and tombstones included") {
    import org.apache.spark.sql.types._
    val t = newTable()
    val log = new java.io.File(t, "_delta_log"); log.mkdirs()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val schemaStr = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(schema.json)
    Files.write(new java.io.File(log, "00000000000000000000.json").toPath,
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
        s"""{"metaData":{"id":"v2w","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{}}}""")
        .mkString("\n")).getBytes("UTF-8"))
    import spark.implicits._
    DeltaLakeWrite.append((0L until 6L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(1), t)            // v1
    DeltaLakeWrite.append(Seq((10L, "x")).toDF("id", "v"), t) // v2
    graft.ingest.DeltaLakeDml.delete(spark, t, "id = 3")      // v3: DV
    val v = DeltaLakeRead.latestVersion(t)
    DeltaLakeWrite.checkpoint(spark, t, v)
    // the feature selects the V2 form: UUID manifest + sidecars, no
    // classic checkpoint name
    val names = log.listFiles().map(_.getName).toSeq
    assert(!names.contains(f"$v%020d.checkpoint.parquet"))
    assert(names.exists(_.matches(
      f"$v%020d" + "\\.checkpoint\\.[-a-f0-9]+\\.parquet")))
    val scDir = new java.io.File(log, "_sidecars")
    assert(scDir.isDirectory && scDir.listFiles().nonEmpty)
    // replay survives vacuuming every commit
    (0L to v).foreach { i =>
      Files.delete(new java.io.File(log, f"$i%020d.json").toPath)
    }
    def ids(): Seq[Long] = DeltaLakeRead.snapshot(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids() === Seq(0L, 1L, 2L, 4L, 5L, 10L))
    val st = DeltaLakeRead.state(spark, t)
    assert(st.files.exists(_.dv.isDefined),
      "the DV descriptor must ride the sidecar")
    assert(st.tombstones.nonEmpty,
      "fresh tombstones must survive the v2 checkpoint")
    // appends continue on top of the v2-seeded state, and the
    // interval knob auto-emits the next v2 checkpoint
    DeltaLakeWrite.append(Seq((20L, "y")).toDF("id", "v"), t,
      checkpointInterval = 1)
    assert(ids() === Seq(0L, 1L, 2L, 4L, 5L, 10L, 20L))
    val names2 = log.listFiles().map(_.getName).toSeq.sorted
    assert(names2.count(_.matches(
      ".*\\.checkpoint\\.[-a-f0-9]+\\.parquet")) >= 2,
      s"the interval append must auto-emit a V2 checkpoint: $names2")
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
