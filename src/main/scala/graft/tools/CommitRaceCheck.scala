package graft.tools

import java.io.File

import graft.ingest.LocalLinkBackend

/** Cross-PROCESS commit-race worker: proves LocalLinkBackend's link(2)
  * put-if-absent claim (ingest/CommitBackend.scala "Safe across
  * PROCESSES") with real JVMs, not just threads — the cross-process
  * analog of VersionedTableSpec's two-session race, forked by the spec
  * via the CatalogSpec ProcessBuilder harness.
  *
  * Protocol mirror of [[graft.ingest.VersionedTableIO]]'s commit loop:
  * list the log dir for the next free version slot, race putIfAbsent
  * on it, advance on win, re-list and retry on loss. No Spark needed —
  * the primitive under test is pure filesystem.
  *
  * Args: logDir writerId nCommits. Blocks on `logDir/START` so both
  * workers enter the race together; prints `COMMITTED n attempts=m`.
  */
object CommitRaceCheck {
  def main(args: Array[String]): Unit = {
    val (dir, writerId, n) = (new File(args(0)), args(1), args(2).toInt)
    dir.mkdirs()
    val start = new File(dir, "START")
    val deadline = System.currentTimeMillis() + 30000
    while (!start.exists()) {
      if (System.currentTimeMillis() > deadline)
        sys.error("race barrier never opened")
      Thread.sleep(1)
    }
    var committed = 0
    var attempts = 0
    while (committed < n) {
      val vs = dir.listFiles((_, nm) => nm.endsWith(".json"))
        .map(_.getName.stripSuffix(".json").toLong)
      val next = if (vs.isEmpty) 1L else vs.max + 1
      val content =
        s"""{"writer":"$writerId","seq":$committed,"version":$next}"""
      attempts += 1
      if (LocalLinkBackend.putIfAbsent(new File(dir, f"$next%020d.json"),
          content.getBytes("UTF-8"))) {
        committed += 1
      }
      if (attempts > n * 1000) sys.error(s"livelock after $attempts attempts")
    }
    println(s"COMMITTED $n attempts=$attempts")
  }
}
