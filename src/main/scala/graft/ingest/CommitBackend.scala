package graft.ingest

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files}
import java.util.concurrent.ConcurrentHashMap

/** The SINGLE mutation primitive the versioned-table protocol needs:
  * atomically publish `content` at `slot` iff no one has claimed the
  * slot — the winner's content must be fully visible the instant the
  * slot exists (no reader may observe a partial commit file).
  *
  * Everything else in [[VersionedTableIO]] (optimistic retry, read
  * validation, idempotent appends, VACUUM) is pure protocol on top of
  * this primitive, so porting the format to an object store is ONLY a
  * new backend: S3 conditional put (`If-None-Match: *`), GCS
  * `ifGenerationMatch=0`, ABFS `If-None-Match` — each is exactly
  * putIfAbsent over the commit key. The reference gets the equivalent
  * guarantee from Delta's LogStore (docker-compose.yaml:125-152 runs
  * four independent spark-submit writers against shared tables). */
trait CommitBackend {

  /** @return true iff THIS call created the slot; false if any other
    *         writer (thread, session, or process) got there first. */
  def putIfAbsent(slot: File, content: Array[Byte]): Boolean
}

/** Local-filesystem backend: write a temp file in the same directory,
  * then hard-link it into the slot. link(2) is atomic put-if-absent
  * (EEXIST on a taken slot) and the content is complete before the
  * slot becomes visible — unlike move-without-replace, which the JDK
  * implements as a non-atomic stat-then-rename. Safe across PROCESSES
  * sharing the filesystem, not just threads. */
object LocalLinkBackend extends CommitBackend {
  override def putIfAbsent(slot: File, content: Array[Byte]): Boolean = {
    val dir = slot.getParentFile
    dir.mkdirs()
    val tmp = File.createTempFile(".commit", ".tmp", dir)
    Files.write(tmp.toPath, content)
    try {
      Files.createLink(slot.toPath, tmp.toPath)
      tmp.delete()
      true
    } catch {
      case _: FileAlreadyExistsException =>
        tmp.delete(); false
    }
  }
}

/** In-memory mock of an object store's conditional put: the atomic
  * claim is a ConcurrentHashMap putIfAbsent on the commit KEY (the
  * store's strong-consistency guarantee), and the winner then mirrors
  * the content to the local path so [[VersionedTableIO]]'s readers
  * work unchanged. Exists to prove the protocol depends on nothing
  * but [[CommitBackend.putIfAbsent]] semantics — VersionedTableSpec
  * runs the multi-session race against BOTH backends. */
final class ConditionalPutBackend extends CommitBackend {
  private val claimed = new ConcurrentHashMap[String, Boolean]()

  override def putIfAbsent(slot: File, content: Array[Byte]): Boolean = {
    if (claimed.putIfAbsent(slot.getAbsolutePath, true) != null) return false
    // winner: materialize for readers. Write-then-link keeps the local
    // mirror crash-consistent too (a reader never sees a partial file).
    val dir = slot.getParentFile
    dir.mkdirs()
    val tmp = File.createTempFile(".commit", ".tmp", dir)
    Files.write(tmp.toPath, content)
    Files.createLink(slot.toPath, tmp.toPath)
    tmp.delete()
    true
  }
}
