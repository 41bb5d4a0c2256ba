package graft.sources

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files}

/** The single storage primitive [[LogTable]]'s optimistic-concurrency
  * protocol needs: publish a fully-written temp file as the next log
  * slot IF AND ONLY IF that slot is still unclaimed, atomically. One
  * winner per slot is the whole correctness story — every other
  * guarantee (snapshot isolation, conflict detection, exactly-once
  * streaming) reduces to it.
  *
  * This is Delta's LogStore seam (Armbrust et al., VLDB 2020 §3.2):
  * local/HDFS filesystems bind it to an atomic metadata operation;
  * object stores without compare-and-swap (pre-conditional-put S3)
  * need an external coordinator (DynamoDB in Delta's S3 LogStore).
  * Keeping the binding behind a trait makes the protocol's storage
  * contract explicit and testable — [[LogProtocolSpec]] proves the
  * protocol SURVIVES with an atomic claim and LOSES COMMITS with a
  * check-then-write one. */
trait LogCommitCoordinator {
  /** Atomically publish `tmp` (fully written, same directory) as
    * `target` iff `target` does not exist. Returns true iff this
    * writer won the slot; on false, `tmp` is cleaned up and the
    * caller re-resolves the head and retries. Must be atomic: two
    * concurrent claims of the same `target` must see exactly one
    * winner, and no reader may ever observe a partially-written
    * `target`. */
  def claim(tmp: File, target: File): Boolean
}

/** POSIX-filesystem binding: `Files.createLink` (hard link) fails
  * with `FileAlreadyExistsException` when the target exists — the
  * create-if-absent primitive `rename(2)` does NOT provide (rename
  * silently REPLACES an existing target on Linux, so an
  * `ATOMIC_MOVE` that races another writer would overwrite their
  * committed version — a lost update). The link publishes the
  * already-complete inode under the target name atomically; the tmp
  * name is then dropped. */
object LocalFsCommitCoordinator extends LogCommitCoordinator {
  override def claim(tmp: File, target: File): Boolean =
    try {
      Files.createLink(target.toPath, tmp.toPath)
      tmp.delete()
      true
    } catch {
      case _: FileAlreadyExistsException =>
        tmp.delete()
        false
    }
}
