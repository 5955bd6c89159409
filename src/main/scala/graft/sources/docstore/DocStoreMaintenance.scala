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
  * Protocol: the compacted copy is fully written to a hidden staging dir
  * inside the collection (invisible to readers — shard listing only picks
  * `part-*.jsonl` at the top level), then old shards are removed and the
  * new ones renamed in, metadata last. Not atomic for CONCURRENT readers —
  * run it like any store's offline compaction window. A crash mid-swap
  * loses no source data until the old shards are deleted, and the staging
  * dir is inert garbage that a re-run cleans up.
  */
object DocStoreMaintenance {
  def compact(spark: SparkSession, path: String, targetShards: Int): Unit = {
    require(targetShards > 0, "targetShards must be positive")
    val dir = new Path(path)
    val f = DocStore.fs(dir)

    // clear inert staging leftovers from a crashed prior run
    f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(".compact-"))
      .foreach(p => f.delete(p, true))

    val staging = new Path(dir, s".compact-${UUID.randomUUID()}")
    spark.read.format("docstore").load(path)
      .repartition(targetShards)
      .write.format("docstore").mode("overwrite").save(staging.toString)

    // swap: data first, metadata last (a reader mid-swap sees a valid
    // schema and whichever shards exist — never a schema with no meaning)
    DocStore.listParts(path).foreach(p => f.delete(p, false))
    DocStore.listParts(staging.toString).foreach { p =>
      if (!f.rename(p, new Path(dir, p.getName)))
        throw new java.io.IOException(s"compact: failed to move shard ${p.getName}")
    }
    Seq(DocStore.StatsFile, DocStore.SchemaFile).foreach { m =>
      val src = new Path(staging, m)
      val dst = new Path(dir, m)
      f.delete(dst, false)
      if (!f.rename(src, dst))
        throw new java.io.IOException(s"compact: failed to move $m")
    }
    f.delete(staging, true)
  }
}
