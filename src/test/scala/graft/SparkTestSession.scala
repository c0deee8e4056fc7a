package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // keep Derby's log out of the repo root (CatalogSpec side effect)
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
