package graft

import graft.ingest.{ParquetTableIO, RunLog}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class RunLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newLog() = new RunLog(
    new ParquetTableIO(Files.createTempDirectory("graft_runlog").toString),
    "ctl")

  test("watermark: none before first run, latest ok run wins, failures ignored") {
    val log = newLog()
    assert(log.lastWatermark(spark).isEmpty)
    log.record(spark, "r1", "2026-01-01", 100)
    log.record(spark, "r2", "2026-01-02", 50)
    log.record(spark, "r3", "2026-01-03", 0, status = "failed")
    assert(log.lastWatermark(spark).contains("2026-01-02"))
  }

  test("file log: unprocessed = listing minus marked, idempotent marking") {
    val log = newLog()
    val files = Seq("a.csv", "b.csv", "c.csv").toDF("path")
    assert(log.unprocessed(spark, files).count() === 3)
    log.markFiles(spark, Seq("a.csv", "b.csv"))
    val left = log.unprocessed(spark, files).collect().map(_.getString(0))
    assert(left.toSeq === Seq("c.csv"))
    log.markFiles(spark, Seq("a.csv")) // duplicate mark is harmless
    assert(log.unprocessed(spark, files).count() === 1)
  }
}
