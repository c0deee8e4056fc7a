package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Deterministic per-query profile: job/stage/task counts, shuffle
  * bytes, spill, and summed executor run/CPU time. These metrics are
  * stable across host-contention windows (unlike wall-clock), so they
  * are the optimization round's primary before/after evidence.
  * Usage: runMain graft.Profile [sfDir] [queryName...]
  */
object Profile {
  final class M {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val spillDisk = new AtomicLong
    val runTimeMs = new AtomicLong
    val cpuTimeNs = new AtomicLong
    val inputBytes = new AtomicLong
    // per-job: jobId -> (submit ns, end ns, taskTime ms, input bytes,
    //                    tasks, description)
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int,
      (Long, Long, Long, Long, Int, String)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0)
      shufWrite.set(0); spillDisk.set(0); runTimeMs.set(0); cpuTimeNs.set(0)
      inputBytes.set(0); jobInfo.clear(); stageToJob.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q100_curation_pipeline")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = new M
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        m.jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        m.jobInfo.put(j.jobId,
          (System.nanoTime(), 0L, 0L, 0L, 0, desc))
        j.stageIds.foreach(sid => m.stageToJob.put(sid, j.jobId))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val prev = m.jobInfo.get(j.jobId)
        if (prev != null) m.jobInfo.put(j.jobId,
          prev.copy(_2 = System.nanoTime()))
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        m.stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        m.tasks.incrementAndGet()
        val tm = t.taskMetrics
        if (tm != null) {
          m.shufRead.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
          m.shufWrite.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
          m.spillDisk.addAndGet(tm.diskBytesSpilled)
          m.runTimeMs.addAndGet(tm.executorRunTime)
          m.cpuTimeNs.addAndGet(tm.executorCpuTime)
          m.inputBytes.addAndGet(tm.inputMetrics.bytesRead)
          val jid = m.stageToJob.get(t.stageId)
          if (jid != null) {
            val prev = m.jobInfo.get(jid.intValue())
            if (prev != null) m.jobInfo.put(jid.intValue(), prev.copy(
              _3 = prev._3 + tm.executorRunTime,
              _4 = prev._4 + tm.inputMetrics.bytesRead,
              _5 = prev._5 + 1))
          }
        }
        ()
      }
    })
    // warm up JVM/codegen
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm pass (C2, file listing, page cache)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(200)
      m.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $n%-32s wall=$wall%7.3f jobs=${m.jobs.get}%3d " +
        f"stages=${m.stages.get}%3d tasks=${m.tasks.get}%5d " +
        f"shufRead=${m.shufRead.get / 1e6}%9.2fMB " +
        f"shufWrite=${m.shufWrite.get / 1e6}%9.2fMB " +
        f"spill=${m.spillDisk.get / 1e6}%7.1fMB " +
        f"taskTime=${m.runTimeMs.get / 1e3}%8.2fs " +
        f"cpu=${m.cpuTimeNs.get / 1e9}%8.2fs " +
        f"input=${m.inputBytes.get / 1e6}%8.2fMB")
      if (sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")) {
        import scala.jdk.CollectionConverters._
        m.jobInfo.asScala.toSeq.sortBy(_._1).foreach {
          case (jid, (s0, s1, tt, in, nt, desc)) =>
            val w = if (s1 > s0) (s1 - s0) / 1e9 else -1.0
            println(f"  JOB $jid%4d wall=$w%7.3f taskTime=${tt / 1e3}%8.2fs " +
              f"tasks=$nt%4d input=${in / 1e6}%8.2fMB  ${desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
