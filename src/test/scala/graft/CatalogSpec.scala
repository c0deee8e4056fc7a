package graft

import graft.ingest.ParquetTableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 gaps: S7 schema evolution, S11 DDL registration,
  * S12 TBLPROPERTIES, S14 local-rows source, O6 limit(0) template,
  * and the misc uuid/monotonic id functions. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("S7: appends with evolving schema surface old rows with nulls") {
    val io = new ParquetTableIO(
      java.nio.file.Files.createTempDirectory("graft_evo").toString)
    io.append(Seq((1, "a")).toDF("k", "v"), "t")
    io.append(Seq((2, "b", 9.5)).toDF("k", "v", "extra"), "t")
    val got = io.read(spark, "t")
    assert(got.columns.sorted.toSeq === Seq("extra", "k", "v"))
    assert(got.filter(col("k") === 1).first().isNullAt(
      got.columns.indexOf("extra")))
  }

  test("S11/S12: CREATE DATABASE/TABLE ... LOCATION, TBLPROPERTIES, DROP") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_silver")
    Seq((1, "x")).toDF("k", "v").write.mode("overwrite")
      .saveAsTable("graft_silver.demo")
    assert(spark.read.table("graft_silver.demo").count() === 1)
    spark.sql(
      "ALTER TABLE graft_silver.demo SET TBLPROPERTIES ('graft.layer'='silver')")
    val props = spark.sql("SHOW TBLPROPERTIES graft_silver.demo")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.layer").contains("silver"))
    spark.sql("DROP TABLE graft_silver.demo")
    spark.sql("DROP DATABASE graft_silver")
  }

  test("S14: local-rows source via createDataFrame") {
    val df = spark.createDataFrame(Seq(ConfigRow(1L, "a", active = true),
      ConfigRow(2L, "b", active = false)))
    assert(df.filter(col("active")).count() === 1)
  }

  test("O6: limit(0) bootstraps an empty same-schema frame") {
    val src = Seq((1, "a")).toDF("k", "v")
    val empty = src.limit(0)
    assert(empty.count() === 0 && empty.schema === src.schema)
    assert(empty.unionByName(src).count() === 1)
  }

  test("misc: uuid() unique per row, monotonically_increasing_id unique") {
    val df = spark.range(500).repartition(5)
      .select(expr("uuid()").as("u"), monotonically_increasing_id().as("m"))
    val r = df.agg(countDistinct(col("u")), countDistinct(col("m"))).first()
    assert(r.getLong(0) === 500L && r.getLong(1) === 500L)
  }

  test("external-reader contract: a second session reads a written table " +
    "by catalog name with partition pruning") {
    // the reference's Trino-over-metastore contract
    // (trino/etc/catalog/delta.properties analog): engine A writes
    // hive-style partitioned files + registers ONLY the catalog entry;
    // reader B is a fresh session (no temp views, no DataFrame handles)
    // resolving by name through the shared catalog
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "part_key", "x")
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    spark.sql(s"CREATE TABLE ext_orders USING parquet LOCATION '$dir'")
    try {
      val reader = spark.newSession()
      // fresh session state: parent temp views are invisible…
      spark.range(1).createOrReplaceTempView("only_in_parent")
      assert(!reader.catalog.tableExists("only_in_parent"))
      // …but the catalog table resolves; Hive-style partition recovery
      // (MSCK REPAIR) registers the on-disk partition directories
      reader.sql("MSCK REPAIR TABLE ext_orders")
      val got = reader.sql(
        "SELECT id, x FROM ext_orders WHERE part_key = 'a' ORDER BY id")
        .as[(Long, Double)](reader.implicits.newProductEncoder).collect().toSeq
      assert(got === Seq((1L, 10.0), (2L, 20.0)))
      // the partition filter must prune at scan time, not post-filter
      val plan = reader.sql(
        "SELECT id FROM ext_orders WHERE part_key = 'a'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(part_key"), plan)
    } finally spark.sql("DROP TABLE ext_orders")
  }

  test("persistent metastore: a table registered by one JVM resolves by " +
    "name, with properties and partition pruning, from a fresh JVM") {
    // catalogImplementation is a STATIC conf — the in-process session is
    // in-memory-catalog, so the hive/derby path must run in forked JVMs
    // (which is also the point: persistence across process boundaries,
    // the reference's shared-metastore contract). graft.tools
    // .MetastoreCheck does the work; this test forks write then read.
    // Deploying against a REAL Thrift/Postgres Hive metastore swaps
    // only the connection conf — see README "Catalog deployment".
    val base = java.nio.file.Files.createTempDirectory("graft_ms").toString
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def fork(mode: String): String = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-Dderby.stream.error.file=target/derby.log",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.MetastoreCheck", mode, base, s"$base/warehouse")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() === 0, out.linesIterator.toSeq.takeRight(25)
        .mkString("\n"))
      out
    }
    assert(fork("write").contains("WROTE 100"))
    // the reader JVM shares NOTHING with the writer but the metastore
    // files: name resolution, TBLPROPERTIES, and pruning must all come
    // from the persisted catalog
    assert(fork("read").contains("READ 100 pruned=25 prunedPlan=true " +
      "prop=silver"))
  }
}

case class ConfigRow(id: Long, name: String, active: Boolean)
