package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tsDf(rows: Seq[(Long, String)], c: String) =
    rows.toDF("id", "s").select(col("id"), col("s").cast("timestamp").as(c))

  test("bucketed range join equals the naive theta join; boundaries half-open") {
    val points = tsDf(Seq(
      (1L, "2024-01-01 00:00:00"), // == start: included
      (2L, "2024-01-01 11:59:59"), (3L, "2024-01-01 12:00:00"), // == end: excluded
      (4L, "2024-01-03 05:00:00"), (5L, "2023-12-31 23:59:59")), "ts")
    val intervals = Seq(
      (10L, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
      (11L, "2024-01-01 06:00:00", "2024-01-04 00:00:00"))
      .toDF("iid", "a", "b")
      .select(col("iid"), col("a").cast("timestamp").as("start_ts"),
        col("b").cast("timestamp").as("end_ts"))

    val got = RangeJoin.pointInInterval(points, intervals,
      "ts", "start_ts", "end_ts", bucketWidth = 3600)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
      col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("bucketed range join avoids the nested-loop plan") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.sfDir, "events")
    val intervals = spark.range(0, 5).select(
      col("id").as("iid"),
      expr("timestampadd(DAY, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00')").as("start_ts"))
      .withColumn("end_ts", expr("timestampadd(HOUR, 36, start_ts)"))
    val bucketed = RangeJoin.pointInInterval(ev, intervals,
      "ts", "start_ts", "end_ts", 86400L)
    assert(!bucketed.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val naive = ev.join(intervals,
      col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
    assert(bucketed.count() === naive.count())
  }
}
