package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table access for the test star schema (TESTDATA.md).
  *
  * Mirrors the reference's catalog-table source (S6,
  * uber/bronze2_to_silver.py:43) without a Hive metastore: tables are
  * resolved by name under a scale-factor directory. At cluster scale the
  * same code path works against any `spark.read.parquet`-able location
  * (S3A, HDFS); nothing here is local-mode specific.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
