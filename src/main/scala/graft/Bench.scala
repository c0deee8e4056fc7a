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
      // Apply AQE to plans under .persist() (default false in Spark 4
      // only for cached-partitioning stability, which nothing here
      // relies on — attachDistributed is the one partition-sensitive
      // op and it is spec-only). Without this every cached frame
      // materializes at the static shuffle-partition count and its
      // consumers inherit that fan-out; with it the cache adopts
      // AQE-coalesced partitioning — scale-adaptive by definition
      // (guide §2.2): size-appropriate partitions at any SF. Measured
      // at sf0.1: q130 taskTime 91 s → 6.9 s, q100 30 s → 3.2 s.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    // streaming machinery warm-up: the first streaming query of a JVM
    // pays one-time costs (state-store/provider classloading, offset-log
    // codepaths) that would otherwise land on whichever streaming query
    // runs first in pass 1 — run a throwaway AvailableNow stream here.
    // The sink name is uniquified and the temp tree deleted afterwards
    // so repeated bench runs in one JVM neither collide on the memory
    // query name nor leak the checkpoint dir.
    // Timed: a minimal AvailableNow stream's wall-clock IS the fixed
    // per-query streaming machinery cost (checkpoint dir, offset/commit
    // logs, state-store provider, memory sink) that every real
    // streaming query below pays on top of its data work. Reported as
    // stream_overhead_sec so the seven streaming queries' totals can be
    // read net of it — honest measurement, not a timing exclusion.
    var streamOverheadSec = 0.0
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("bench_warm")
      spark.range(10).toDF("v").write.parquet(s"$tmp/in")
      def noopStream(i: Int): Double = {
        val sinkName = s"bench_warm_sink_${System.nanoTime()}"
        val t0 = System.nanoTime()
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType))))
          .parquet(s"$tmp/in")
          .groupBy().count()
          .writeStream
          .format("memory").queryName(sinkName)
          .outputMode("complete")
          .option("checkpointLocation", s"$tmp/ckpt$i")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
        spark.catalog.dropTempView(sinkName)
        (System.nanoTime() - t0) / 1e9
      }
      noopStream(0) // warm-up run absorbs the one-time classloading
      streamOverheadSec = noopStream(1) // steady-state machinery cost
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(); ()
      }
      rmTree(tmp.toFile)
    }

    // Host-speed canary: a fixed CPU-bound probe (~0.2 s clean) timed
    // once per pass. Its per-pass wall-clock rides in the artifact so a
    // sustained contended window — which inflates EVERY pass, the one
    // failure mode min-of-N interleaving cannot defend (round-7: q100
    // 5× inflated in both driver passes) — is labeled by the canary
    // instead of read as a plan regression next round.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).selectExpr("sum(id % 7)", "avg(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // (elapsed, errored): a throwing query must surface as an ERROR in
    // the artifact, never as a plausible timing — before round 9 the
    // catch swallowed the failure and the elapsed time was recorded
    // anyway, so a query that started throwing would bench as a fast
    // number and only CORRECTNESS would catch it.
    // Materialize every output column via the noop sink: the old
    // `.count()` let Catalyst prune output columns a count does not
    // need, silently deleting the expensive part of text-building
    // queries from the timing (q173's whole classifier battery, the
    // reassembled text of q127/q170 — the ShuffleAudit count-pruning
    // bug, found in round 9 via the q175 composition). Timings from
    // before this change undercount exactly those queries;
    // SPARK_GRAFT_BENCH_COUNT_ONLY=1 reproduces the old action for
    // anchor archaeology.
    val countOnly = sys.env.contains("SPARK_GRAFT_BENCH_COUNT_ONLY")
    def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val errored =
        try {
          if (countOnly) fn(spark, sfDir).count()
          else fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          false
        }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"BENCH QUERY ERROR: ${e.getClass.getName}: " +
            s"${e.getMessage}")
          true
        }
      ((System.nanoTime() - t0) / 1e9, errored)
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
    // dev-loop filter: comma-separated query names; the token
    // "@audited" expands to ShuffleAudit.Audited — the canonical
    // text/dedup/ANN kernel set, so the KB-doc bench (BASELINE.md)
    // times exactly the queries the shuffle audit covers without a
    // hand-maintained name list drifting out of sync.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",")
      .flatMap {
        case "@audited" => ShuffleAudit.Audited.map(_._1)
        case n => Seq(n)
      }.toSet)
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val canaries = scala.collection.mutable.ArrayBuffer[Double]()
    // Untimed warm-up: the first canary execution pays its own codegen/
    // JIT compilation (measured ~0.5 s cold vs ~0.3 s warm on the r9
    // host), which read as "pass-1 contention" in cross-round
    // comparisons. canary_sec must measure the HOST, not the canary.
    canary()
    val passes: Seq[Map[String, (Double, Boolean)]] = (1 to iters).map { _ =>
      canaries += canary()
      queryList.map { case (name, fn) => name -> timeQuery(fn) }.toMap
    }
    val prelim: Map[String, Double] =
      queryList.map { case (name, _) =>
        name -> passes.map(_(name)._1).min
      }.toMap

    // Outlier retry: any query whose min-of-N still exceeds 3× its
    // committed clean-run anchor (tools/bench_reference.json, pinned in
    // git — bench_latest.json is overwritten by every full run and may
    // hold a contended driver run) gets ONE more attempt after the main
    // passes, when a transient window has had the longest time to
    // clear. The sub-second floor keeps noise-scale queries out of the
    // retry set. A retried query that repairs → the outlier was
    // transient; one that doesn't, with a clean canary → real
    // regression; with an inflated canary → host contention, labeled.
    val refTimes: Map[String, Double] = {
      // tools/bench_reference.json is the MATERIALIZE-action anchor
      // since round 10 (the count-era anchor was retired with the r9
      // action correction — its figures undercounted queries whose
      // output columns count() pruned). A countOnly archaeology run
      // compared against it can only under-read, so the 3× retry
      // guard stays silent there — harmless.
      val f = new java.io.File("tools/bench_reference.json")
      if (!f.exists()) Map.empty
      else try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        mapper.registerModule(
          com.fasterxml.jackson.module.scala.DefaultScalaModule)
        val root = mapper.readTree(f)
        val q = root.get("queries")
        import scala.jdk.CollectionConverters._
        q.properties().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    }
    val suspects = queryList.map(_._1).filter { name =>
      refTimes.get(name).exists(ref =>
        prelim(name) > 3 * ref && prelim(name) - ref > 1.0)
    }
    val retried: Map[String, (Double, Boolean)] =
      if (suspects.isEmpty) Map.empty
      else {
        canaries += canary()
        suspects.map { name =>
          val fn = SparkEntry.queries(name)
          name -> timeQuery(fn)
        }.toMap
      }

    // A query that errored in ANY run is listed in the artifact's
    // "errors" key and reports time -1 — impossible to misread as a
    // healthy timing, and the headline total excludes it.
    val erroredQueries: Seq[String] = queryList.map(_._1).filter { name =>
      passes.exists(_(name)._2) || retried.get(name).exists(_._2)
    }
    val results = queryList.map { case (name, _) =>
      val times = passes.map(_(name)._1) ++ retried.get(name).map(_._1)
      // (min, spread): min-of-N is the comparison basis between rounds;
      // the spread (max-min over passes) separates host I/O-wait
      // noise from a real plan regression — a query whose min moved but
      // whose spread is tight changed for real, a huge spread on
      // unchanged code is a noisy window (round-4 lesson).
      // an errored query reports -1 for BOTH min and spread: a spread
      // mixing time-to-throw with healthy passes would read as an
      // extreme noise window in the round-over-round analysis
      val mn = if (erroredQueries.contains(name)) -1.0 else times.min
      val sp = if (erroredQueries.contains(name)) -1.0
        else times.max - times.min
      name -> (mn, sp)
    }
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, sp)) => "\"" + k + "\":" + sp }
      .mkString("{", ",", "}")
    val total =
      if (results.nonEmpty) results.map(_._2._1).filter(_ >= 0).sum else 0.0
    val canaryJson = canaries.mkString("[", ",", "]")
    val retriedJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errorsJson = erroredQueries.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // Headline keys LAST: the artifact capture keeps the tail of the
    // line, so the total/count/errors must survive even if the
    // per-query map is truncated at the front.
    val json =
      s"""{"queries":$qs,"spread":$spreads,"canary_sec":$canaryJson,"retried":$retriedJson,"stream_overhead_sec":$streamOverheadSec,"iters":$iters,"n_queries":${results.size},"errors":$errorsJson,"n_errors":${erroredQueries.size},"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(json)
    // Durable copy: the driver's stdout-tail capture has truncated the
    // per-query map head two rounds running; the file keeps every query
    // diffable between rounds. FULL runs only — a filtered dev-loop run
    // must not clobber the round artifact with a partial map.
    // SPARK_GRAFT_BENCH_OUT names an explicit artifact path for
    // FILTERED runs (the KB-doc bench writes tools/bench_kbdoc_*.json
    // through it); unset, full runs keep owning bench_latest.json.
    sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(java.nio.file.Paths.get(_))
      .orElse(if (only.isEmpty)
        Some(java.nio.file.Paths.get("tools/bench_latest.json")) else None)
      .foreach { out =>
        if (out.getParent != null)
          java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.write(out,
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    spark.stop()
  }
}
