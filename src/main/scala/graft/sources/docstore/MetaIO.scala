package graft.sources.docstore

import org.apache.hadoop.fs.{FileSystem, Path}

/** Narrow facade over [[DocStore]]'s crash-hardened metadata I/O for other
  * graft modules (the shingle index's segment markers). Exposes exactly
  * the two pieces a marker-committed layout needs — the atomic
  * write-then-rename (with its create-once claim branch) and the shared
  * Hadoop conf resolution — without widening the visibility of the
  * docstore internals themselves.
  */
private[graft] object MetaIO {
  /** See [[DocStore.writeFileAtomic]]: temp file + atomic rename; with
    * `overwrite=false` a create-once claim that returns false (and
    * removes its temp) when the destination already exists.
    */
  def writeFileAtomic(p: Path, bytes: Array[Byte], overwrite: Boolean = true): Boolean =
    DocStore.writeFileAtomic(p, bytes, overwrite)

  /** Filesystem for `p` under the JVM-wide conf that honors
    * `spark.hadoop.*` overrides (see [[DocStore.fs]]).
    */
  def fs(p: Path): FileSystem = DocStore.fs(p)
}
