package graft.tools

import java.io.File

import graft.ingest.{CommitBackend, LocalLinkBackend, RemoteCondPutBackend}

/** Cross-PROCESS commit-race worker: proves the put-if-absent claim
  * with real JVMs, not just threads — the cross-process analog of
  * VersionedTableSpec's two-session race, forked by the spec via the
  * CatalogSpec ProcessBuilder harness. Two backends:
  *
  *  - `link` (default): LocalLinkBackend's link(2) EEXIST guarantee
  *    (ingest/CommitBackend.scala "Safe across PROCESSES");
  *  - `condput:<port>`: [[RemoteCondPutBackend]] against a
  *    [[CondPutStore]] — the object-store form, where the atomic
  *    arbitration lives in a separate store process and the workers
  *    share NOTHING but the store endpoint and the read path.
  *
  * Protocol mirror of [[graft.ingest.VersionedTableIO]]'s commit loop:
  * list the log dir for the next free version slot, race putIfAbsent
  * on it, advance on win, re-list and retry on loss. No Spark needed —
  * the primitive under test is pure commit arbitration.
  *
  * Args: logDir writerId nCommits [link|condput:<port>]. Blocks on
  * `logDir/START` so both workers enter the race together; prints
  * `COMMITTED n attempts=m`. */
object CommitRaceCheck {
  def main(args: Array[String]): Unit = {
    val (dir, writerId, n) = (new File(args(0)), args(1), args(2).toInt)
    val backend: CommitBackend =
      if (args.length > 3 && args(3).startsWith("condput:"))
        new RemoteCondPutBackend("127.0.0.1",
          args(3).stripPrefix("condput:").toInt)
      else LocalLinkBackend
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
      if (backend.putIfAbsent(new File(dir, f"$next%020d.json"),
          content.getBytes("UTF-8"))) {
        committed += 1
      }
      if (attempts > n * 1000) sys.error(s"livelock after $attempts attempts")
    }
    println(s"COMMITTED $n attempts=$attempts")
  }
}
