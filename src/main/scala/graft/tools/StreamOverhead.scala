package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Round-14 measurement tool: where does the fixed per-query
  * streaming-machinery cost go? Times minimal AvailableNow drains in
  * several configurations (stateful vs stateless, shuffle-partition
  * counts, noop vs memory sink). Measurement only — not a query path.
  * Usage: runMain graft.tools.StreamOverhead
  */
object StreamOverhead {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("so").toString
    spark.range(10).toDF("v").write.parquet(s"$tmp/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))

    var n = 0
    def run(label: String, stateful: Boolean, parts: Option[String]): Unit = {
      n += 1
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(schema).parquet(s"$tmp/in")
      val q = (if (stateful) src.groupBy().count() else src)
      val sink = s"so_sink_$n"
      val st = q.writeStream.format("memory").queryName(sink)
        .outputMode(if (stateful) "complete" else "append")
        .option("checkpointLocation", s"$tmp/ck$n")
        .trigger(Trigger.AvailableNow()).start()
      st.awaitTermination()
      val el = (System.nanoTime() - t0) / 1e9
      spark.catalog.dropTempView(sink)
      parts.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", prev))
      println(f"SO $label%-42s $el%7.3f s")
    }
    // warm-up (classloading)
    run("warmup (stateful, 32 parts)", stateful = true, None)
    run("stateful, default parts", stateful = true, None)
    run("stateful, default parts (again)", stateful = true, None)
    run("stateful, 1 shuffle part", stateful = true, Some("1"))
    run("stateful, 1 shuffle part (again)", stateful = true, Some("1"))
    run("stateless", stateful = false, None)
    run("stateless (again)", stateful = false, None)
    spark.stop()
  }
}
