package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `fs.file.impl` override for local runs: the stock local filesystem,
  * with the fork-per-file permission call replaced by java.nio.
  *
  * Without the Hadoop native bindings (`libhadoop.so` — absent in this
  * environment and in most slim containers), `RawLocalFileSystem
  * .setPermission` falls back to `Shell.execCommand("chmod", ...)`:
  * every created file and directory forks a whole child process (measured
  * here: 2 forks per created file — data + crc sidecar — at ~2-4 ms each
  * on a large-heap JVM). That is pure overhead on write-heavy work: a
  * single docstore maintenance query forked chmod 120+ times, and Spark's
  * own parquet/ORC committers pay the same tax per task file.
  * `Files.setPosixFilePermissions` sets the identical mode bits with one
  * syscall and no fork.
  *
  * Semantics are unchanged: same permission bits, same checksummed
  * behavior (this wraps the raw FS exactly like `LocalFileSystem` does).
  * Special bits java.nio cannot express (setuid/setgid/sticky) defer to
  * the stock fork-based path; non-POSIX stores likewise. On a real
  * cluster (HDFS/object stores) this class is simply not configured —
  * it is a local-scheme optimization only.
  *
  * Wired via `spark.hadoop.fs.file.impl=graft.sources.FastLocalFileSystem`
  * in the session builders; DocStore's per-JVM Hadoop conf honors the
  * same `spark.hadoop.*` overrides, so connector-internal `fs()` handles
  * resolve to this class too.
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & 0xE00) != 0) { // setuid/setgid/sticky: java.nio can't set these
      super.setPermission(p, permission)
      return
    }
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def add(mask: Int, perm: PosixFilePermission): Unit =
      if ((bits & mask) != 0) { perms.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    catch {
      // non-POSIX mount or an FS that refuses: the stock path still works
      case _: UnsupportedOperationException => super.setPermission(p, permission)
    }
  }
}
