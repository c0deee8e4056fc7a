package graft

import graft.core.SessionFactory
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SessionFactorySpec extends AnyFunSuite {

  // SessionFactory.build getOrCreate-reuses the suite-shared session in
  // this JVM (its withExtensions path needs a fresh process) — the
  // register() path is what is testable here, and exercises the same
  // function triple the extensions inject.
  lazy val spark = SessionFactory.build(master = "local[4]",
    shufflePartitions = Some(4))
  import spark.implicits._

  test("extensions expose rolling_hash to SQL") {
    graft.core.GraftExtensions.register(spark)
    val got = spark.sql("SELECT rolling_hash('ab') AS h").first().getLong(0)
    assert(got === 31L * 97 + 98)
    // and it agrees with the Column API form
    val viaCol = Seq("ab").toDF("t")
      .select(graft.functions.RollingHash.rollingHash(
        org.apache.spark.sql.functions.col("t"))).first().getLong(0)
    assert(viaCol === got)
  }

  test("corrupt files are skipped, not fatal") {
    val dir = Files.createTempDirectory("graft_corrupt").toString
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Files.writeString(java.nio.file.Paths.get(s"$dir/garbage.parquet"),
      "this is not parquet")
    // ignoreCorruptFiles applies at scan time; schema inference would
    // still die on the bad footer → pass the schema (production shape)
    val schema = Seq((1, "a")).toDF("k", "v").schema
    assert(spark.read.schema(schema).parquet(dir).count() === 2)
  }

  test("session confs: UTC, AQE, skew join") {
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }
}
