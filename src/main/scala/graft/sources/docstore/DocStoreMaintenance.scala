package graft.sources.docstore

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Offline maintenance for docstore collections.
  *
  * Streaming ingestion appends one shard per task per epoch, so a
  * long-running collection accumulates small files — the classic
  * small-files problem: shard count drives scan parallelism AND per-file
  * open overhead, and a million 10 KB shards makes every query
  * metadata-bound. `compact` rewrites the collection into `targetShards`
  * evenly-sized shards through the connector itself (so stats, schema, and
  * encoding stay consistent by construction).
  *
  * Crash-safe two-phase protocol. Phase 1 (prepare): write the compacted
  * copy to a hidden staging dir inside the collection (invisible to
  * readers — shard listing only matches top-level `part-*.jsonl`). Phase 2
  * (swap), made atomic-in-effect by a COMMIT MARKER: create
  * `_compact_commit` recording the staging id and the old shard list, then
  * delete old shards, move staged files in, remove staging and marker.
  * Recovery on the next compact() call:
  *   - marker present  → the previous run was PAST the commit point: roll
  *     it FORWARD (finish deleting the listed old shards, move any staged
  *     files still in its staging dir, clear the marker) before starting;
  *   - marker absent   → any staging dirs predate a commit point; the live
  *     collection is complete, so staging is inert garbage — delete it.
  * At no point is the only copy of a document deleted: old shards are only
  * removed after the full compacted copy exists AND the marker durably
  * names them. Not atomic for CONCURRENT readers — run in a maintenance
  * window like any store's offline compaction.
  *
  * `compact` also serves as a distributed STATS REBUILD — a collection
  * whose shards predate zone maps (no `_stats.json` entries) gains full
  * stats by compacting to any shard count, because the rewrite goes
  * through the connector's writers, which collect stats inline.
  */
object DocStoreMaintenance {
  private val Marker = "_compact_commit"

  def compact(spark: SparkSession, path: String, targetShards: Int): Unit = {
    require(targetShards > 0, "targetShards must be positive")
    val dir = new Path(path)
    val f = DocStore.fs(dir)

    recover(path)

    // Phase 1: prepare the full compacted copy in staging. Encoding is
    // preserved: if every existing shard is gzip, the compacted shards are
    // gzip too (a mixed collection normalizes to plain).
    val stagingId = UUID.randomUUID().toString
    val staging = new Path(dir, s".compact-$stagingId")
    val oldShards = DocStore.listParts(path).map(_.getName)
    val keepGzip = oldShards.nonEmpty && oldShards.forall(_.endsWith(".gz"))
    spark.read.format("docstore").load(path)
      .repartition(targetShards)
      .write.format("docstore").mode("overwrite")
      .option("compression", if (keepGzip) "gzip" else "none")
      .save(staging.toString)

    // Commit point: the marker durably records what to delete and where
    // the replacement lives.
    val markerPath = new Path(dir, Marker)
    val out = f.create(markerPath, true)
    try out.write((stagingId +: oldShards.toSeq).mkString("\n").getBytes("UTF-8"))
    finally out.close()

    // Phase 2: swap, then clear the marker.
    swap(path, stagingId, oldShards.toSet)
    f.delete(markerPath, false)
  }

  /** Roll a committed-but-unfinished swap forward, then clear pre-commit
    * staging garbage. Idempotent; safe to call on a healthy collection.
    */
  private def recover(path: String): Unit = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val markerPath = new Path(dir, Marker)
    if (f.exists(markerPath)) {
      val in = f.open(markerPath)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      swap(path, content.head, content.tail.toSet)
      f.delete(markerPath, false)
    }
    f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(".compact-"))
      .foreach(p => f.delete(p, true))
  }

  /** Delete `oldShards` (those still present) and move the staged files of
    * `stagingId` into the collection, metadata last. Idempotent: re-running
    * after a crash at any point completes the same end state.
    */
  private def swap(path: String, stagingId: String, oldShards: Set[String]): Unit = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val staging = new Path(dir, s".compact-$stagingId")
    DocStore.listParts(path).filter(p => oldShards.contains(p.getName))
      .foreach(p => f.delete(p, false))
    if (f.exists(staging)) {
      DocStore.listParts(staging.toString).foreach { p =>
        if (!f.rename(p, new Path(dir, p.getName)))
          throw new java.io.IOException(s"compact: failed to move shard ${p.getName}")
      }
      Seq(DocStore.StatsFile, DocStore.SchemaFile).foreach { m =>
        val src = new Path(staging, m)
        if (f.exists(src)) {
          val dst = new Path(dir, m)
          f.delete(dst, false)
          if (!f.rename(src, dst))
            throw new java.io.IOException(s"compact: failed to move $m")
        }
      }
      f.delete(staging, true)
    }
  }
}
