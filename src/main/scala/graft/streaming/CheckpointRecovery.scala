package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Restart recovery for a streaming checkpoint after a hard crash
  * (kill -9 / OOM-kill) — the r16→r17 adjudication of the one
  * unexplained StreamCrashFuzzSpec red (seed 20260912, reproduced and
  * diagnosed by tools/stream_crash_hunt.sh).
  *
  * The window, fully named: Spark's HDFSMetadataLog writes each offsets
  * entry via CheckpointFileManager's rename protocol — create
  * `.<batchId>.<uuid>.tmp`, then rename onto `<batchId>`. A process kill
  * BETWEEN those two steps during the very FIRST offsets write (batch 0)
  * leaves the checkpoint's `offsets/` dir holding only the orphan temp
  * (plus its crc sidecar on checksummed filesystems). On restart,
  * `offsetLog.getLatest()` correctly ignores the temp (batch-file filter)
  * and concludes this is a NEW query — but Spark 4.x's
  * `verifyNewCheckpointDirectory` (SQLConf
  * `spark.sql.streaming.verifyCheckpointDirectoryEmptyOnStart`, default
  * true) then does a RAW `list()` of offsets/state/commits and throws
  * `STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY` because the listing is
  * non-empty — tripping over Spark's OWN crash garbage. Fail-stop, not
  * data loss: nothing was committed, exactly-once is intact, the query
  * just refuses to start.
  *
  * This helper deletes exactly that garbage: files matching the
  * CheckpointFileManager rename-temp shape (`.<name>.<uuid>.tmp`, with
  * any crc sidecars) from the checkpoint's two metadata-log dirs
  * (`offsets/`, `commits/`). Temps are pre-rename scratch by
  * construction — every reader ignores them and no completed write needs
  * one — so deleting them is safe whenever no query is ACTIVE on the
  * checkpoint, which is Spark's own single-owner precondition for the
  * directory. `state/` is deliberately untouched: state files only exist
  * after a committed offsets entry, at which point the new-checkpoint
  * verification never runs (and state cleanup is the state store's own
  * maintenance job).
  *
  * Call before (re)starting a query on a checkpoint that may have been
  * hard-killed; `streamingIngest` does this automatically when given a
  * checkpoint dir. Disabling the Spark check instead
  * (`verifyCheckpointDirectoryEmptyOnStart=false`) would also mask REAL
  * user error (pointing a new query at a dirty foreign checkpoint) —
  * this removes only provable crash scrap.
  */
object CheckpointRecovery {

  // CheckpointFileManager.createTempFile: ".<finalName>.<uuid>.tmp"
  private val RenameTemp =
    """^\.(.+)\.[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\.tmp$""".r
  // ChecksumFileSystem sidecar of such a temp: ".<tempName>.crc"
  private val RenameTempCrc =
    """^\.\.(.+)\.[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\.tmp\.crc$""".r

  private[graft] def isRenameTemp(name: String): Boolean = name match {
    case RenameTemp(_) => true
    case RenameTempCrc(_) => true
    case _ => false
  }

  /** Drop orphaned rename-protocol temp files from `checkpointDir`'s
    * metadata-log dirs. Returns the deleted file names (for logs/tests).
    * MUST only be called while no streaming query runs on the checkpoint
    * — the same single-owner contract Spark requires of the dir itself.
    */
  def dropOrphanRenameTemps(spark: SparkSession, checkpointDir: String): Seq[String] = {
    // best-effort END TO END, not just per delete: recovery must never be
    // the reason a query fails to start. Anything this sweep cannot do
    // (dir vanishing under a tmp-cleaner between exists and list, a
    // transient remote-store fault, ...) is left for Spark to surface
    // with its own, clearer error on start.
    def sweep(fs: org.apache.hadoop.fs.FileSystem, sub: String, dir: Path): Seq[String] =
      try {
        if (!fs.exists(dir)) Nil
        else
          fs.listStatus(dir).toSeq
            .filter(st => st.isFile && isRenameTemp(st.getPath.getName))
            .flatMap { st =>
              // delete(data) on a checksummed fs also drops the sidecar
              try { fs.delete(st.getPath, false); Some(s"$sub/${st.getPath.getName}") }
              catch { case scala.util.control.NonFatal(_) => None }
            }
      } catch { case scala.util.control.NonFatal(_) => Nil }
    try {
      val root = new Path(checkpointDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      Seq("offsets", "commits").flatMap(sub => sweep(fs, sub, new Path(root, sub)))
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }
}
