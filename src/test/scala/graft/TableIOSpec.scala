package graft

import graft.ingest.ParquetTableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newIO() = new ParquetTableIO(
    Files.createTempDirectory("graft_io").toString)

  test("append accumulates; overwrite replaces") {
    val io = newIO()
    io.append(Seq((1, "a")).toDF("k", "v"), "t")
    io.append(Seq((2, "b")).toDF("k", "v"), "t")
    assert(io.read(spark, "t").count() === 2)
    io.overwrite(Seq((9, "z")).toDF("k", "v"), "t")
    assert(io.read(spark, "t").collect().map(_.getInt(0)).toSeq === Seq(9))
  }

  test("merge: source wins on key, target survives off-key (S9 semantics)") {
    val io = newIO()
    val target = Seq((1, "t1"), (2, "t2"), (3, "t3")).toDF("k", "v")
    val source = Seq((2, "s2"), (4, "s4")).toDF("k", "v")
    val merged = io.merge(target, source, Seq("k"))
      .orderBy("k").as[(Int, String)].collect().toSeq
    assert(merged === Seq((1, "t1"), (2, "s2"), (3, "t3"), (4, "s4")))
  }

  test("upsert is idempotent: re-upserting the same source is a no-op") {
    val io = newIO()
    val v1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    io.upsert(spark, v1, "t", Seq("k"))
    io.upsert(spark, v1, "t", Seq("k"))
    assert(io.read(spark, "t").count() === 2)
    val v2 = Seq((2, "B"), (3, "c")).toDF("k", "v")
    io.upsert(spark, v2, "t", Seq("k"))
    val got = io.read(spark, "t").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("compact rewrites to the requested file count, values unchanged") {
    val io = newIO()
    io.overwrite(spark.range(100).toDF("x").repartition(8), "t")
    io.compact(spark, "t", numFiles = 2)
    val dir = new java.io.File(
      new java.net.URI(io.read(spark, "t").inputFiles.head)).getParentFile
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) === 2)
    assert(io.read(spark, "t").agg(sum("x")).first().getLong(0) === 4950L)
  }

  test("clustered compaction: disjoint value ranges per file, content preserved") {
    val io = newIO()
    io.overwrite(spark.range(1000).toDF("x").repartition(8), "t")
    io.compactClustered(spark, "t", numFiles = 4, clusterCols = Seq("x"))
    val t = io.read(spark, "t")
    assert(t.agg(sum("x")).first().getLong(0) === 499500L)
    // per-file min/max ranges must not overlap (that's what enables
    // stats-based skipping)
    val ranges = t.groupBy(input_file_name().as("f"))
      .agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length === 4)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2)
    }
  }

  test("partitioned append writes hive-style dirs") {
    val io = newIO()
    io.append(Seq((1, "x"), (2, "y")).toDF("k", "part"), "t",
      partitionBy = Seq("part"))
    val got = io.read(spark, "t")
    assert(got.select("part").distinct().count() === 2)
    // hive-style layout on disk → partition pruning can engage
    val root = new java.io.File(
      new java.net.URI(got.inputFiles.head)).getParentFile.getParentFile
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("part=x", "part=y"))
    assert(got.filter(col("part") === "x").count() === 1)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val io = newIO()
    io.overwrite(Seq((1, "a", "x"), (2, "b", "x"), (3, "c", "y"))
      .toDF("k", "v", "part"), "t", partitionBy = Seq("part"))
    val root = new java.io.File(new java.net.URI(
      io.read(spark, "t").inputFiles.head)).getParentFile.getParentFile
    def xFiles = new java.io.File(root, "part=x")
      .listFiles().map(f => f.getName -> f.lastModified()).toSet
    val xBefore = xFiles
    // rewrite partition y only; x must be physically untouched
    io.overwritePartitions(Seq((30, "c2", "y")).toDF("k", "v", "part"),
      "t", partitionBy = Seq("part"))
    val got = io.read(spark, "t")
    assert(got.orderBy("k").as[(Int, String, String)].collect().toSeq ===
      Seq((1, "a", "x"), (2, "b", "x"), (30, "c2", "y")))
    assert(xFiles === xBefore)
  }
}
