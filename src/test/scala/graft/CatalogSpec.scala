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
}

case class ConfigRow(id: Long, name: String, active: Boolean)
