package graft.tools

import java.io.{DataInputStream, DataOutputStream, File}
import java.net.ServerSocket
import java.nio.file.Files

/** Minimal localhost "object store" for the cross-process commit
  * race: a SINGLE-THREADED TCP server that serializes conditional
  * puts the way a real store's strong consistency does (S3
  * `If-None-Match: *`, GCS `ifGenerationMatch=0` — the arbitration
  * lives at the service endpoint, not in any client). One request
  * per connection: `writeUTF(key) writeInt(len) bytes` → the server
  * replies `writeBoolean(won)`. On a win it durably materializes the
  * content at the key path via write-temp-then-atomic-link, so
  * clients reading the shared filesystem (the LIST/GET analog) never
  * observe a partial commit object.
  *
  * Clients connect through [[graft.ingest.RemoteCondPutBackend]] —
  * two independent JVMs get real put-if-absent semantics with no
  * shared memory and no reliance on link(2) in the CLIENTS.
  * VersionedTableSpec forks the race against this store. */
object CondPutStore {

  /** Serve until `stop` flips; returns the bound port via callback. */
  def serve(port: Int, ready: Int => Unit,
      stop: java.util.concurrent.atomic.AtomicBoolean): Unit = {
    val server = new ServerSocket(port)
    server.setSoTimeout(200)
    ready(server.getLocalPort)
    val claimed = new java.util.HashSet[String]()
    try {
      while (!stop.get()) {
        val sock =
          try server.accept()
          catch { case _: java.net.SocketTimeoutException => null }
        if (sock != null) try {
          val in = new DataInputStream(sock.getInputStream)
          val key = in.readUTF()
          val content = new Array[Byte](in.readInt())
          in.readFully(content)
          // single-threaded: add() IS the atomic conditional put
          val won = claimed.add(key)
          if (won) {
            val slot = new File(key)
            slot.getParentFile.mkdirs()
            val tmp = File.createTempFile(".put", ".tmp", slot.getParentFile)
            Files.write(tmp.toPath, content)
            Files.createLink(slot.toPath, tmp.toPath)
            tmp.delete()
          }
          val out = new DataOutputStream(sock.getOutputStream)
          out.writeBoolean(won)
          out.flush()
        } finally sock.close()
      }
    } finally server.close()
  }

  def main(args: Array[String]): Unit = {
    val port = if (args.nonEmpty) args(0).toInt else 0
    serve(port, p => println(s"LISTENING $p"),
      new java.util.concurrent.atomic.AtomicBoolean(false))
  }
}
