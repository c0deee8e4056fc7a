package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: latest right at-or-before, nulls before first, per-key isolation") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", "p1"), // after c1, c2 → c2
      (1L, "2024-01-01 08:30:00", "p2"), // after c1 only → c1
      (1L, "2024-01-01 07:00:00", "p3"), // before any click → null
      (2L, "2024-01-01 10:00:00", "p4")) // key 2 has no clicks → null
      .toDF("user_id", "s", "name")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("name"))
    val right = Seq(
      (1L, "2024-01-01 08:00:00", 1.0),
      (1L, "2024-01-01 09:00:00", 2.0))
      .toDF("user_id", "s", "click")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("click"))

    val got = AsOf.join(left, right, "user_id", "ts")
      .orderBy("name")
      .select("name", "asof_click")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    assert(got.toSeq === Seq(
      ("p1", Some(2.0)), ("p2", Some(1.0)), ("p3", None), ("p4", None)))
  }

  test("as-of join: right row at the exact left timestamp is included (<= semantics)") {
    val left = Seq((1L, "2024-01-01 09:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val right = Seq((1L, "2024-01-01 09:00:00", 7.0))
      .toDF("user_id", "s", "v")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("v"))
    val got = AsOf.join(left, right, "user_id", "ts").first()
    assert(got.getAs[Double]("asof_v") === 7.0)
  }

  test("as-of join plans one shuffle (single Exchange on the key)") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.sfDir, "events")
    val df = AsOf.join(
      ev.filter(col("event_type") === "purchase").select("user_id", "ts", "value"),
      ev.filter(col("event_type") === "click").select("user_id", "ts", "value"),
      "user_id", "ts")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges === 1, df.queryExecution.executedPlan.toString)
  }

  test("native as-of operator handles edge semantics like the composed form") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", "p1"), (1L, "2024-01-01 08:30:00", "p2"),
      (1L, "2024-01-01 07:00:00", "p3"), (2L, "2024-01-01 10:00:00", "p4"))
      .toDF("user_id", "s", "name")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("name"))
    val right = Seq(
      (1L, "2024-01-01 08:00:00", 1.0), (1L, "2024-01-01 09:00:00", 2.0),
      (3L, "2024-01-01 01:00:00", 9.0)) // right-only key never surfaces
      .toDF("user_id", "s", "click")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("click"))
    val got = AsOf.joinNative(left, right, "user_id", "ts")
      .orderBy("name").select("name", "asof_click")
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(got.toSeq === Seq(
      ("p1", Some(2.0)), ("p2", Some(1.0)), ("p3", None), ("p4", None)))
  }

  test("native as-of operator agrees with the composed form on real data") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.sfDir, "events")
    def l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    def r = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val composed = AsOf.join(l, r, "user_id", "ts").collect().toSet
    val native = AsOf.joinNative(l, r, "user_id", "ts").collect().toSet
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("native as-of: NULL keys and timestamps never match (SQL semantics)") {
    val left = Seq(
      (Some(1L), Some("2024-01-01 10:00:00"), "ok"),
      (None, Some("2024-01-01 10:00:00"), "nullkey"),
      (Some(1L), None, "nullts"))
      .toDF("user_id", "s", "name")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("name"))
    val right = Seq(
      (Some(1L), Some("2024-01-01 08:00:00"), 1.0),
      (None, Some("2024-01-01 07:00:00"), 8.0), // null right key: dead
      (Some(1L), None, 9.0))                    // null right ts: dead
      .toDF("user_id", "s", "click")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("click"))
    val got = AsOf.joinNative(left, right, "user_id", "ts")
      .select("name", "asof_click")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(got === Map("ok" -> Some(1.0), "nullkey" -> None, "nullts" -> None))
  }

  test("native as-of rejects mismatched key/time types instead of mis-joining") {
    val l = Seq((1, "2024-01-01 10:00:00")).toDF("user_id", "s")
      .select(col("user_id").cast("int").as("user_id"),
        col("s").cast("timestamp").as("ts"))
    val r = Seq((1L, "2024-01-01 08:00:00", 1.0)).toDF("user_id", "s", "v")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("v"))
    intercept[IllegalArgumentException] {
      AsOf.joinNative(l, r, "user_id", "ts")
    }
  }

  test("native as-of plans as AsOfJoinExec with one exchange per side") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.sfDir, "events")
    val df = AsOf.joinNative(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts", "value"),
      ev.filter(col("event_type") === "click").select("user_id", "ts", "value"),
      "user_id", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges (one per side):\n$plan")
  }

  test("native as-of: downstream ops re-exchange on right-side keys but " +
    "not left-side keys (left-outer partitioning contract)") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.sfDir, "events")
    def joined = AsOf.joinNative(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"),
      ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value"),
      "user_id", "ts")
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    // grouping on the LEFT key reuses the join's partitioning (2 join
    // exchanges, none added) — outputPartitioning reports the left side…
    assert(exchanges(joined.groupBy("user_id").count()) === 2)
    // …and ONLY the left side: any non-left-key grouping re-exchanges
    // (unmatched left rows carry null-extended right columns, so no
    // right-side distribution may be reported for a left-outer join)
    assert(exchanges(joined.groupBy("asof_value").count()) === 3)
  }
}
