package graft.sources.docstore

import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

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
  * RETIRE old shards (move to `_retired/`, where prior version manifests
  * still resolve them — physical deletion is [[vacuum]]'s job), move
  * staged files in, remove staging and marker.
  * Recovery on the next compact() call:
  *   - marker present  → the previous run was PAST the commit point: roll
  *     it FORWARD (finish retiring the listed old shards, move any staged
  *     files still in its staging dir, clear the marker) before starting;
  *   - marker absent   → any staging dirs predate a commit point; the live
  *     collection is complete, so staging is inert garbage — delete it.
  * At no point is the only copy of a document unreachable: old shards are
  * only retired after the full compacted copy exists AND the marker
  * durably names them, and retired bytes survive until an explicit
  * vacuum whose retention horizon no longer references them. Not atomic
  * for CONCURRENT readers — run in a maintenance window like any store's
  * offline compaction.
  *
  * `compact` also serves as a distributed STATS REBUILD — a collection
  * whose shards predate zone maps (no `_stats.json` entries) gains full
  * stats by compacting to any shard count, because the rewrite goes
  * through the connector's writers, which collect stats inline.
  */
object DocStoreMaintenance {
  private val Marker = "_compact_commit"

  /** Write the commit marker ATOMICALLY: content goes to a temp name
    * first, then renames into place. A direct create+write+close can be
    * torn by a crash mid-write, and recover() rolling forward from a
    * truncated marker either deletes old shards whose replacements never
    * got listed (data loss) or moves replacements without deleting the
    * olds (duplication) — the two failure modes the two-phase swap exists
    * to exclude. A crash before the rename leaves only an ignored temp
    * file (recover matches the exact marker name) and the operation
    * simply never committed; rename is atomic on HDFS and the local FS.
    */
  private def writeMarkerAtomic(f: FileSystem, dir: Path, lines: Seq[String]): Path = {
    val markerPath = new Path(dir, Marker)
    val tmp = new Path(dir, Marker + ".inprogress")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    // checksummed local FS renames data then .crc — drop the stale
    // sidecar first so a crash between the steps leaves a READABLE
    // marker (valid data, no checksum), not an unreadable one
    DocStore.dropCrcSidecar(f, markerPath)
    if (f.exists(markerPath)) f.delete(markerPath, false)
    if (!f.rename(tmp, markerPath))
      throw new java.io.IOException(s"marker rename failed: $tmp -> $markerPath")
    markerPath
  }

  /** Heartbeat lease (r14): every maintenance op holds `_maint_lease`
    * while it runs and deletes it on exit (success OR failure; a crash
    * leaves it to go stale). [[vacuum]]'s in-flight guard reads it: live
    * lease → refuse, stale/absent → proceed. This replaces the old
    * staging-dir-mtime heuristic, whose window was wall-clock luck: a
    * 100 TB phase-1 staging write with a long quiet gap between its last
    * file create and its marker commit could be raced by vacuum despite
    * the single-maintenance-writer contract. The heartbeat makes liveness
    * mechanical — the only way a live op's lease reads stale is a process
    * freeze longer than the TTL, the irreducible tradeoff of any lease
    * protocol (documented here, TTL generous at 10 min vs a 2-min
    * heartbeat).
    *
    * The heartbeat is the lease file's MODIFICATION TIME, refreshed via
    * `FileSystem.setTimes` by a daemon thread; the CONTENT (op id +
    * acquire timestamp) is written once, atomically, at acquire and never
    * rewritten. The first cut refreshed by rewriting the file
    * (delete + rename), which reopened exactly the luck window the lease
    * exists to close: a reader landing in the delete→rename gap saw NO
    * lease and proceeded beside a live op, and an in-flight heartbeat
    * rename could land after the release delete, resurrecting a lease for
    * a completed op. With setTimes the file exists CONTINUOUSLY from
    * acquire to release (no reader gap), and a racing heartbeat can only
    * bump the mtime of a file the release is about to delete — never
    * recreate it. setTimes takes the timestamp we pass
    * (System.currentTimeMillis), so liveness math never depends on a
    * remote filesystem's clock; rename preserves the staged file's mtime
    * on HDFS and POSIX, so the acquire itself is beat zero.
    *
    * The lease does NOT arbitrate maintenance-vs-maintenance: acquiring
    * overwrites unconditionally, because concurrent rewrite ops on one
    * collection are already out of contract (single maintenance writer)
    * and refusing here would turn every post-crash rerun into a manual
    * TTL wait. (Release is ownership-checked — it deletes the file only
    * if it still carries this op's id — which NARROWS an out-of-contract
    * overlap's exposure to the read→delete instants of the release
    * itself; a survivor whose acquire lands inside that window can still
    * be stripped, the irreducible check-then-act residue of a filesystem
    * with no compare-and-delete. In contract there is no second op, so
    * the window is moot.) It exists so the one reader that must be SAFE
    * beside a live op — vacuum, which deletes bytes — has a mechanical
    * signal.
    */
  private[graft] val LeaseFile = "_maint_lease"
  private[graft] val LeaseTtlMs: Long = 10L * 60 * 1000
  private[docstore] final case class Lease(opId: String, heartbeatMs: Long)

  private def writeLeaseAtomic(f: FileSystem, dir: Path, opId: String): Unit = {
    // The temp name carries the op id (r15): a FIXED ".inprogress" name
    // was a cross-process collision — vacuum legitimately acquires in the
    // gap between two ops' leases, and its rename of the shared temp
    // yanked a concurrently-acquiring op's in-flight create out from
    // under it (ChecksumFS FileNotFound mid-create; LeaseFuzzSpec's two-
    // JVM storm hit it on the first seed). Unique temps never collide; a
    // crash between create and rename leaks one, which recover() sweeps
    // age-gated alongside the writer temps.
    val tmp = new Path(dir, s"$LeaseFile.inprogress-$opId")
    def stageTmp(): Unit = {
      val out = f.create(tmp, true)
      try out.write(s"$opId\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
    }
    stageTmp()
    val lp = new Path(dir, LeaseFile)
    // Acquire-over-a-stale-lease goes through [[DocStore.atomicRename]]
    // (overwrite): on the local scheme that is rename(2) — a TRUE atomic
    // replace, no no-lease gap at all — and on HDFS FileContext's
    // server-side atomic OVERWRITE; a reader racing a post-crash rerun's
    // acquire sees old lease or new lease, never none. Only the remaining
    // fallback (remote scheme with no FileContext) emulates overwrite as
    // delete-then-rename, where two racing acquires can interleave
    // (A deletes dst, B renames in, A's rename dies on FileAlreadyExists).
    // Racing acquires are last-writer-wins by this protocol's own
    // semantics (acquire-over is unconditional), so a LOST rename race is
    // retryable, not fatal: retry a few times on either branch. The
    // emulation's microsecond no-lease gap only occurs replacing a STALE
    // lease (in contract there is no live-lease overwrite), and a reader
    // in that gap concludes exactly what the stale lease would have told
    // it — no op holds the collection. (r15 lesson kept in force: paths
    // into FileContext must be QUALIFIED — atomicRename qualifies both.)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      // drop lp's stale .crc sidecar each attempt (see writeFileAtomic's
      // note): shrinks readLease's checksum-retry window and keeps a
      // crash between the FS's data/crc rename steps readable
      DocStore.dropCrcSidecar(f, lp)
      try {
        done = DocStore.atomicRename(f, tmp, lp, overwrite = true)
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => done = false
        case e if e.isInstanceOf[java.io.FileNotFoundException] ||
                  e.isInstanceOf[java.nio.file.NoSuchFileException] =>
          // ChecksumFs renames the DATA file then the .crc as two calls,
          // and an interleaved racing acquire can fail a later step after
          // our temp's data already moved — a retry then renames a
          // CONSUMED temp and FNFs (LeaseFuzzSpec caught this escaping as
          // a peer crash; the nio fast path surfaces the same consumed-
          // temp state as NoSuchFileException). If the lease now carries
          // OUR op id, the acquire took effect despite the exception;
          // otherwise restage below and retry.
          done = readLease(f, dir).exists(_.opId == opId)
      }
      if (!done) {
        if (attempts >= 5)
          throw new java.io.IOException(
            s"lease rename failed after $attempts attempts: $tmp -> $lp")
        Thread.sleep(10L * attempts)
        // a partially-successful attempt consumes the temp either way
        // (its data file moved); restage so the next rename has a source
        if (!f.exists(tmp)) stageTmp()
      }
    }
    // Beat zero on OUR clock: rename preserves whatever mtime the remote
    // filesystem's clock stamped at create, while vacuum's staleness math
    // and every subsequent heartbeat use local System.currentTimeMillis —
    // with fs/namenode clock skew approaching the TTL, a freshly acquired
    // lease could read stale for up to one heartbeat interval until the
    // first setTimes beat lands. Stamp it explicitly so all beats,
    // including the zeroth, are on the clock vacuum compares against.
    // Ownership-guarded (r16, advisory): an unconditional stamp after a
    // concurrent acquire-over (out of contract, but the fuzz drives it)
    // would freshen the OTHER op's lease — harmless while it is live, but
    // it can resurrect a lease vacuum was about to classify stale. Same
    // check the FNF retry uses; the re-read-to-stamp window is the
    // unavoidable residue, vastly narrower than always-stamp. (r17
    // adjudication: the residue — an acquire-over landing between
    // readLease and setTimes, or the stamp racing the lease file's own
    // two-step data/crc rename — is ACCEPTED. Freshening the other op's
    // live lease by one beat merely delays a vacuum classification; it
    // never grants ownership, which every mutation re-checks by opId. The
    // airtight alternative, re-WRITING the lease with our opId so
    // ownership and freshness update atomically, would turn every
    // heartbeat into a full atomic-rename cycle and make the beat itself
    // race acquire-over renames — strictly more moving parts for a
    // residue the fuzz has never converted into a safety violation.)
    // Best-effort: a failure here is the heartbeat thread's persistent-
    // failure warning path, not an acquire failure.
    try {
      if (readLease(f, dir).exists(_.opId == opId))
        f.setTimes(lp, System.currentTimeMillis(), -1)
    } catch { case scala.util.control.NonFatal(_) => }
  }

  private[docstore] def readLease(f: FileSystem, dir: Path): Option[Lease] = {
    val lp = new Path(dir, LeaseFile)
    // status-then-open, each tolerating a concurrent release's delete:
    // the lease protocol guarantees no absence GAP while an op is live,
    // so a missing file here really means "no op holds the lease"
    val statusOpt =
      try Some(f.getFileStatus(lp))
      catch { case _: java.io.FileNotFoundException => None }
    statusOpt.flatMap { st =>
      // "A live op never rewrites the content" is ALMOST true — the one
      // exception is acquire-over-a-stale-lease, which DOES replace the
      // content, and on checksummed filesystems (LocalFs/ChecksumFs) the
      // rename moves the data file and its .crc as two non-atomic steps.
      // A reader landing between them gets a ChecksumException for a
      // lease that is LIVE; classifying that instant as stale would let
      // vacuum sweep it and proceed beside the live op — the exact
      // overlap the lease exists to prevent. So checksum failures RETRY
      // briefly (the window is two file moves; milliseconds), and a
      // PERSISTENT mismatch (out-of-band edits under a stale .crc, a
      // corrupt block on a crashed host) reads as an unreadable lease
      // whose liveness is the file's real mtime: a genuinely crashed
      // op's corruption passes the TTL and is swept like any stale
      // lease — corruption still never blocks vacuum forever — while a
      // live op's fresh mtime keeps vacuum out. Any OTHER IOException
      // (a transient read fault — datanode hiccup, connection reset)
      // PROPAGATES: mapping it to stale would let vacuum treat a live
      // op's unreadable-this-instant lease as crashed and delete bytes
      // beside it; a guard that gates deletion fails loudly, not open.
      def attempt(): Option[String] =
        try {
          val in = f.open(lp)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => None }
      val textOpt: Option[Either[Unit, String]] =
        try attempt().map(Right(_))
        catch {
          case _: org.apache.hadoop.fs.ChecksumException =>
            val retried =
              try { Thread.sleep(50); attempt().map(Right(_)) }
              catch { case _: org.apache.hadoop.fs.ChecksumException => Some(Left(())) }
            retried
        }
      textOpt.map {
        case Left(()) =>
          // persistently checksum-failing: identity unreadable, liveness
          // from the heartbeat mtime (see the retry rationale above)
          Lease("unreadable-checksum", st.getModificationTime)
        case Right(text) =>
          text.split("\n", 2) match {
            // liveness is the file's mtime (the setTimes heartbeat), not
            // the acquire timestamp in the content
            case Array(id, hb) if hb.trim.nonEmpty && hb.trim.forall(_.isDigit) =>
              Lease(id, st.getModificationTime)
            // a malformed lease never blocks forever: treat as written at
            // epoch 0 (= stale), so vacuum proceeds and the file is swept
            case _ => Lease("malformed", 0L)
          }
      }
    }
  }

  /** Runs `body` holding the collection's heartbeat lease. */
  private def withLease[T](path: String)(body: => T): T = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val opId = UUID.randomUUID().toString
    writeLeaseAtomic(f, dir, opId)
    val lp = new Path(dir, LeaseFile)
    @volatile var running = true
    val hb = new Thread(() => {
      var misses = 0
      while (running) {
        try Thread.sleep(LeaseTtlMs / 5) catch { case _: InterruptedException => }
        if (running) {
          // a heartbeat failure must not kill the op mid-rewrite; a missed
          // beat only narrows the safety margin toward the TTL — but a
          // PERSISTENT failure (setTimes unsupported/denied on this FS)
          // means the lease WILL read stale while the op still runs, so
          // it is warned once, loudly, instead of swallowed forever
          try { f.setTimes(lp, System.currentTimeMillis(), -1); misses = 0 }
          catch { case scala.util.control.NonFatal(e) =>
            misses += 1
            if (misses == 3) System.err.println(
              s"[docstore] lease heartbeat for op $opId has failed $misses times in a row " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage}) — if this persists past the " +
                s"${LeaseTtlMs / 60000}-min TTL, vacuum will read this LIVE op's lease as stale; " +
                "do not run vacuum beside it until it completes")
          }
        }
      }
    }, s"docstore-lease-$opId")
    hb.setDaemon(true)
    hb.start()
    try body
    finally {
      running = false
      hb.interrupt()
      hb.join(2000)
      // ownership-checked release: delete only OUR lease. If an
      // out-of-contract concurrent op overwrote it, its protection
      // survives this op's exit instead of being stripped.
      try {
        if (readLease(f, dir).exists(_.opId == opId)) f.delete(lp, false)
      } catch { case scala.util.control.NonFatal(_) => }
    }
  }

  def compact(spark: SparkSession, path: String, targetShards: Int): Unit = {
    require(targetShards > 0, "targetShards must be positive")
    rewriteAll(spark, path, _.repartition(targetShards))
  }

  /** Re-cluster a live collection on the Morton interleave of two fields
    * ([[graft.operators.Layout.zorderCluster]]): same crash-safe rewrite
    * as [[compact]], but the staged copy is range-partitioned on the
    * z-value, so every rewritten shard becomes a dyadic box in
    * (colA, colB) space and the store's zone maps prune 2-D range
    * predicates on BOTH fields afterward. The offline "OPTIMIZE ...
    * ZORDER BY" maintenance action of warehouse table formats.
    */
  def cluster(spark: SparkSession, path: String, targetShards: Int,
              colA: String, colB: String): Unit = {
    require(targetShards > 0, "targetShards must be positive")
    rewriteAll(spark, path, df => graft.operators.Layout.zorderCluster(
      df, org.apache.spark.sql.functions.col(colA),
      org.apache.spark.sql.functions.col(colB), targetShards))
  }

  private def rewriteAll(spark: SparkSession, path: String,
                         transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = withLease(path) {
    val dir = new Path(path)
    val f = DocStore.fs(dir)

    recover(path)

    // Phase 1: prepare the full compacted copy in staging. Encoding is
    // preserved: if every existing shard is gzip, the compacted shards are
    // gzip too (a mixed collection normalizes to plain).
    val stagingId = UUID.randomUUID().toString
    val staging = new Path(dir, s".compact-$stagingId")
    // Capture the rewrite's input as the COMMITTED shard set, atomically
    // under the metadata lock (stats land in lockstep with every commit):
    // a concurrent writer's task-committed-but-job-uncommitted shard file
    // is already visible to a raw listing, and rewriting it would either
    // resurrect data from a job that later aborts or strip a column whose
    // schema merge is still pending. The staged read is PINNED to exactly
    // these files (option("shards", ...)), so shards committed after the
    // capture survive the swap untouched, entries intact (the swap's
    // merge-aware metadata phase). Fallback: a legacy collection with NO
    // stats file at all (the documented stats-rebuild use of compact)
    // rewrites everything it lists — that path requires the writer-free
    // maintenance window the compact scaladoc already prescribes.
    val (oldShards, stats) = DocStore.metadataLock.synchronized {
      val st = DocStore.readStats(path, DocStore.readStoredSchema(path))
      val listed = DocStore.listParts(path).map(_.getName)
      (if (st.isEmpty) listed else listed.filter(st.contains), st)
    }
    val keepGzip = oldShards.nonEmpty && oldShards.forall(_.endsWith(".gz"))
    // carry per-field bloom tracking through the rewrite: the prior stats
    // say which fields were bloom-indexed, and dropping that here would
    // silently degrade point-lookup pruning to zone maps forever after
    val blooms = trackedBloomFields(stats)
    // The pin rides a comma-delimited option string with no escaping —
    // safe for the current UUID-derived shard names, but a silent format
    // assumption: a future naming scheme containing ',' would mis-split
    // the pin set and compact a DIFFERENT file list than was captured
    // under the lock. Fail loudly at the option-building site instead.
    oldShards.find(_.contains(",")).foreach { s =>
      throw new IllegalStateException(
        s"compact: shard name '$s' contains ',' — the shards pin option is comma-delimited and cannot encode it")
    }
    val writer0 = transform(spark.read.format("docstore")
        .option("shards", oldShards.mkString(",")).load(path))
      .write.format("docstore").mode("overwrite")
      .option("compression", if (keepGzip) "gzip" else "none")
    (if (blooms.nonEmpty) writer0.option("bloom.fields", blooms.toSeq.sorted.mkString(","))
     else writer0).save(staging.toString)

    // Commit point: the marker durably records what to delete and where
    // the replacement lives.
    val markerPath = writeMarkerAtomic(f, dir, stagingId +: oldShards.toSeq)

    // Phase 2: swap, then clear the marker.
    swap(path, stagingId, oldShards.toSet)
    f.delete(markerPath, false)
  }

  /** `delete_many(filter)`: remove every document matching ALL `filters`
    * (conjunction, `find` semantics — absent field = null). Returns the
    * number of documents deleted.
    *
    * Scale design: ZONE-MAP PRUNED REWRITE. Only shards whose stats admit
    * a possible match are rewritten (the same [[DocStore.shardMayMatch]]
    * decision the scan planner uses — a delete keyed on a clustered field
    * touches only the shards that hold it); untouched shards keep their
    * bytes and their stats entries. Affected shards rewrite in parallel,
    * one task per shard, through the connector's own writer (stats
    * collected inline; a shard whose every document matched simply
    * disappears). The swap reuses compaction's crash-safe commit-marker
    * protocol — at no point is the only copy of a surviving document
    * deleted — and zombie task attempts are fenced by keeping only the
    * shards the successful attempts reported. Same maintenance-window
    * caveat as [[compact]] for concurrent readers.
    */
  def deleteWhere(spark: SparkSession, path: String, filters: Seq[Filter]): Long = {
    // Unconditional DELETE (SQL `DELETE FROM t` arrives as AlwaysTrue; an
    // empty conjunction means the same): a metadata-level truncate.
    // Without this branch shardMayMatch keeps every shard and the rewrite
    // path gunzips + JSON-parses the ENTIRE collection just to write
    // nothing back — O(total bytes) for what is O(shards) file deletes.
    val unconditional = filters.isEmpty ||
      filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (unconditional) truncateAll(path)
    else rewriteWhere(spark, path, filters, sets = Map.empty, delete = true)
  }

  /** Delete every document: count, retire the shard files, reset stats,
    * and append an empty next version (history stays readable until
    * vacuum, like every other maintenance rewrite). No marker needed: the
    * protocol protects SURVIVING documents mid-crash, and a truncate has
    * none — a re-run completes the deletion.
    *
    * The returned count comes from the recovered per-shard stats (exact —
    * every commit writes them in lockstep with the data), restricted to
    * shards STILL ON DISK, with a direct line count only for a stats-less
    * shard. This keeps the count idempotent under crash-rerun: a shard a
    * crashed earlier truncate already removed is neither counted (its
    * rows were that run's deletions) nor scanned — the previous
    * connector-read count either failed loudly on manifest entries
    * pointing at deleted shards or, when the stats-only COUNT pushdown
    * fired, returned a stale total including already-deleted rows. Each
    * run reports exactly the documents IT removes; across a crash the
    * per-run counts sum to the original total.
    */
  private def truncateAll(path: String): Long = withLease(path) {
    recover(path)
    val stats = DocStore.readStats(path)
    val live = DocStore.listParts(path)
    val n = live.iterator.map { p =>
      stats.get(p.getName).map(_.count).getOrElse(countShardDocs(path, p.getName))
    }.sum
    live.foreach(p => DocStore.retireShard(path, p.getName))
    DocStore.writeStats(path, Map.empty)
    DocStore.writeManifest(path, reset = false)
    n
  }

  /** Exact document count of one shard by direct line scan — the fallback
    * for the (commit-protocol-violating, never produced by this writer)
    * case of a shard file with no stats entry.
    */
  private def countShardDocs(dir: String, shard: String): Long = {
    val src = new Path(dir, shard)
    var in: java.io.InputStream = DocStore.fs(src).open(src)
    try {
      if (shard.endsWith(".gz")) in = new java.util.zip.GZIPInputStream(in)
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().count(_.nonEmpty).toLong
    } finally in.close()
  }

  /** `update_many(filter, {$set: sets})`: set literal values on every
    * matching document; a null value unsets the field (absent reads back
    * as null — the store's native null). Returns the number of documents
    * updated. Same pruned-rewrite machinery as [[deleteWhere]].
    */
  def updateWhere(spark: SparkSession, path: String, filters: Seq[Filter],
                  sets: Map[String, Any]): Long = {
    require(sets.nonEmpty, "updateWhere requires at least one field to set")
    rewriteWhere(spark, path, filters, sets, delete = false)
  }

  private def rewriteWhere(spark: SparkSession, path: String, filters: Seq[Filter],
                           sets: Map[String, Any], delete: Boolean): Long = withLease(path) {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    recover(path)
    val opName = if (delete) "deleteWhere" else "updateWhere"
    val schema = DocStore.readStoredSchema(path)
    filters.foreach(fl => require(DocStoreFilters.supported(schema, fl),
      s"docstore $opName: unsupported filter $fl (top-level schema fields only)"))
    validateSets(schema, sets)

    val stats = DocStore.readStats(path, schema)
    val all = DocStore.listParts(path).map(_.getName)
    // prune on positive evidence only: a shard without stats is rewritten
    val affected = all.filter { s =>
      stats.get(s).forall(st => filters.forall(DocStore.shardMayMatch(_, st)))
    }
    if (affected.isEmpty) return 0L

    val stagingId = UUID.randomUUID().toString
    val staging = new Path(dir, s".compact-$stagingId")
    f.mkdirs(staging)
    val (pathStr, stagingStr) = (path, staging.toString)
    val blooms = trackedBloomFields(stats)
    val slices = math.max(1, math.min(affected.length, spark.sparkContext.defaultParallelism))
    val results = spark.sparkContext.parallelize(affected.toSeq.zipWithIndex, slices)
      .map { case (shard, idx) =>
        rewriteShard(pathStr, stagingStr, shard, schema, filters, sets, delete, idx, blooms) }
      .collect()
    val matched = results.map(_._3).sum
    if (matched == 0L) { f.delete(staging, true); return 0L } // no doc changed — keep originals

    // Only shards where a document actually matched are replaced; a
    // zone-map false positive (or stats-less shard) that matched nothing
    // keeps its original bytes and name — its staged rewrite is dropped.
    val changed = results.filter(_._3 > 0L)
    val toReplace = changed.map(_._1).toSet
    val replacements = changed.flatMap(_._2).toMap // empty-result shards just disappear
    commitSwap(path, stagingId, toReplace, replacements, stats)
    matched
  }

  /** Bulk `replace_one(upsert=true)`: for every document in `incoming`,
    * REPLACE the stored document carrying the same `keyField` value (whole-
    * document replace, not `$set` merge — a column absent from the batch
    * writes back as the store's native absent/null), and INSERT documents
    * whose key is not stored yet. Returns (replaced, inserted) counted at
    * KEY level: a key that matched stored documents counts replaced once
    * (historic duplicate copies of that key all drop — replace-by-key
    * collapses them), and replaced + inserted = batch size always.
    *
    * Scale design: the incoming batch is the DELTA of continuous ingestion
    * — the same broadcastable-delta contract as `dd_incremental` — so its
    * key set collects to the driver and prunes shards exactly like a scan:
    * only shards whose zone maps (and blooms, when present) admit at least
    * one incoming key are rewritten; on a key-clustered collection that is
    * the handful of shards actually holding old versions. The batch itself
    * stages as NEW shards through the connector's writer (stats collected
    * inline), one per partition of the incoming DataFrame, so insert
    * parallelism is the batch's own partitioning and the base is never
    * read for the insert side. A batch too large to collect keys for is
    * not a delta — compose a full rewrite via [[compact]]-style plans
    * instead.
    *
    * Crash-safety: old-version drops and new-shard adds commit under ONE
    * marker (same protocol as [[compact]]/[[deleteWhere]]) — the swap is
    * all-or-roll-forward, so no crash point loses a document or applies
    * half the batch. Reference shape: MongoDB `ReplaceOne(upsert=True)`
    * bulk writes (the reference's insert path, `insert_mongo.py:9-15`,
    * re-run on corrected data).
    */
  def upsert(spark: SparkSession, path: String, keyField: String,
             incoming: org.apache.spark.sql.DataFrame): (Long, Long) = withLease(path) {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    recover(path)
    val schema = DocStore.readStoredSchema(path)
    require(schema.fields.exists(_.name == keyField),
      s"docstore upsert: unknown key field '$keyField'")

    // Whole-document replace: align the batch to the stored schema by
    // name; a missing column becomes the store's absent/null. PERSISTED:
    // the batch is executed twice (key collect below, staged write at the
    // end) and a nondeterministic delta — repartition+limit, rand()
    // salting, re-read mutable files — would otherwise collect one key
    // set and stage a DIFFERENT row set, leaving un-dropped old documents
    // for the keys that actually landed (replace-by-key broken silently).
    import org.apache.spark.sql.functions.{col, lit}
    val aligned = incoming.select(schema.fields.toIndexedSeq.map { fld =>
      if (incoming.columns.contains(fld.name)) col(fld.name).cast(fld.dataType).as(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }: _*).persist()
    try {
    val keys = aligned.select(keyField).collect().map(_.get(0))
    if (keys.isEmpty) return (0L, 0L)
    require(keys.forall(_ != null), "docstore upsert: incoming batch has null keys")
    // duplicate detection must use the STORE's equality (cmpValues), not
    // Java equals: -0.0 and 0.0 are distinct to Double.equals but match
    // the same stored documents, which would break replace-by-key.
    // (The zero rule is mirrored in DocStoreFilters.compile/cmpValues/
    // Bloom.hashPair — see the cross-reference comment in compile.)
    def canonKey(v: Any): Any = v match {
      case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
      case f: java.lang.Float => java.lang.Double.valueOf(
        if (f.floatValue() == 0.0f) 0.0 else f.doubleValue())
      case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
      case x => x
    }
    require(keys.map(canonKey).distinct.length == keys.length,
      "docstore upsert: incoming batch has duplicate keys (dedup the delta first)")
    val inFilter: Filter = org.apache.spark.sql.sources.In(keyField, keys)

    val stats = DocStore.readStats(path, schema)
    val all = DocStore.listParts(path).map(_.getName)
    // prune on positive evidence only: a shard without stats is rewritten
    val affected = all.filter { s =>
      stats.get(s).forall(st => DocStore.shardMayMatch(inFilter, st))
    }

    val stagingId = UUID.randomUUID().toString
    val staging = new Path(dir, s".compact-$stagingId")
    f.mkdirs(staging)
    val (pathStr, stagingStr) = (path, staging.toString)

    val blooms = trackedBloomFields(stats)
    // Old versions of incoming keys drop via the pruned per-shard rewrite,
    // which also reports each shard's matched canonical keys — the rewrite
    // pass evaluates the same compiled In filter per document anyway, so a
    // separate counting read of the affected shards would double the I/O
    // and JSON parse work of every upsert.
    val rewriteResults =
      if (affected.isEmpty) Array.empty[(String, Option[(String, DocStore.ShardStat)], Long, Seq[Any])]
      else {
        val slices = math.max(1, math.min(affected.length, spark.sparkContext.defaultParallelism))
        spark.sparkContext.parallelize(affected.toSeq.zipWithIndex, slices)
          .map { case (shard, idx) =>
            rewriteShard(pathStr, stagingStr, shard, schema, Seq(inFilter),
              sets = Map.empty, delete = true, idx, blooms, keyOf = Some(keyField)) }
          .collect()
      }
    // Replaced/inserted are KEY-level (replace_one semantics): a key that
    // matched ≥1 stored document counts replaced ONCE even if historic
    // appends left several copies — all of them drop in the rewrite (the
    // doc-level count would go negative on such duplicates).
    val replaced = rewriteResults.iterator.flatMap(_._4).toSet.size.toLong

    // The batch stages as new shards through the connector's own writer.
    val keepGzip = all.nonEmpty && all.forall(_.endsWith(".gz"))
    val appendResults: Array[(String, DocStore.ShardStat)] =
      aligned.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val w = new DocStoreWriter(stagingStr, schema, partitionId = pid,
            taskId = 0L, jobTag = Some("ups"), gzip = keepGzip, bloomFields = blooms)
          it.foreach(w.write)
          w.commit() match {
            case DocStoreCommit(Some(file), Some(stat)) =>
              Iterator.single(new Path(file).getName -> stat)
            case _ => Iterator.empty
          }
        }
      }.collect()
    val inserted = keys.length.toLong - replaced

    val changed = rewriteResults.filter(_._3 > 0L)
    val toReplace = changed.map(_._1).toSet
    val replacements = changed.flatMap(_._2).toMap ++ appendResults.toMap
    commitSwap(path, stagingId, toReplace, replacements, stats)
    (replaced, inserted)
    } finally aligned.unpersist(blocking = false)
  }

  /** What [[vacuum]] reclaimed: the version numbers whose manifests were
    * dropped, the count of retired shard files deleted, and their bytes.
    */
  final case class VacuumResult(droppedVersions: Seq[Int], deletedShards: Int, freedBytes: Long)

  /** Version retention / physical reclamation — the explicit GC of the
    * retain-on-rewrite model. Keeps the newest `retainVersions` version
    * manifests; drops every older manifest; then deletes each `_retired/`
    * shard referenced by NO retained version (live shards are never
    * touched — they are, by construction, all referenced by the newest
    * manifest). Without this, a 100 TB collection under continuous
    * upsert/compact accumulates unbounded dead bytes and an O(commits)
    * manifest log (each manifest a full shard list, so O(shards²)
    * cumulative metadata under streaming ingest).
    *
    * Crash-safety is DELETION-ORDER discipline, no marker needed:
    * manifests drop BEFORE any shard byte is deleted, so at every crash
    * point each remaining manifest still resolves all of its shards — a
    * mid-vacuum crash leaves only over-retention (some unreferenced
    * retired files), and a re-run completes the reclamation. A reader of
    * a RETAINED version is never broken: its manifest survives, so every
    * shard it references is kept. Reading a version BELOW the horizon
    * concurrently with the vacuum that drops it is out of contract (same
    * maintenance-window rule as compact) and fails loudly, never
    * half-reads.
    *
    * Refuses while another maintenance op is in flight: a commit marker
    * means a swap is mid-flight or crashed (roll it forward via any
    * maintenance action first — they all recover() on entry), and a LIVE
    * heartbeat lease (see [[LeaseFile]]) means an op is actively running
    * (vacuum under the single-maintenance-writer contract must not run
    * beside it). A stale lease is a crashed op: its pre-commit staging
    * dirs are inert garbage and don't block (the next maintenance op's
    * recover() sweeps them). The lease replaced the r13 staging-mtime
    * heuristic — liveness is now a refreshed heartbeat, not wall-clock
    * distance from the last staged file write.
    */
  def vacuum(path: String, retainVersions: Int): VacuumResult = {
    require(retainVersions >= 1, "vacuum: retainVersions must be >= 1")
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    if (f.exists(new Path(dir, Marker)))
      throw new IllegalStateException(
        s"docstore vacuum: a maintenance commit marker is present at $path — a swap is in " +
          "flight or crashed past its commit point; run any maintenance action (e.g. compact) " +
          "to roll it forward, then vacuum")
    readLease(f, dir).foreach { l =>
      val age = System.currentTimeMillis() - l.heartbeatMs
      if (age <= LeaseTtlMs)
        throw new IllegalStateException(
          s"docstore vacuum: maintenance op ${l.opId} holds a live lease at $path " +
            s"(heartbeat ${age / 1000}s ago, TTL ${LeaseTtlMs / 1000}s) — vacuum shares the " +
            "single-maintenance-writer contract, retry after it completes")
      // stale: the op crashed without cleanup — sweep its lease so the
      // state is legible; its staging dirs stay for recover() to sweep
      f.delete(new Path(dir, LeaseFile), false)
    }
    withLease(path) {
    DocStore.metadataLock.synchronized {
      val versions = DocStore.listVersions(path)
      val retained = versions.takeRight(retainVersions)
      val dropped = versions.dropRight(retainVersions)
      // metadata first: once a manifest is gone, nothing can plan a read
      // of that version, so deleting its now-unreferenced bytes below is
      // safe at every crash point in between
      dropped.foreach { v =>
        f.delete(new Path(new Path(dir, DocStore.CommitsDir), f"v$v%06d.json"), false)
      }
      val referenced: Set[String] =
        retained.flatMap(v => DocStore.readManifest(path, v)).toSet ++
          DocStore.listParts(path).map(_.getName)
      var freed = 0L
      var n = 0
      val rd = new Path(dir, DocStore.RetiredDir)
      if (f.exists(rd)) {
        f.listStatus(rd).filterNot(s => referenced.contains(s.getPath.getName)).foreach { s =>
          freed += s.getLen
          n += 1
          f.delete(s.getPath, false)
        }
      }
      VacuumResult(dropped, n, freed)
    }
    }
  }

  private def validateSets(schema: StructType, sets: Map[String, Any]): Unit =
    sets.foreach { case (name, v) =>
      val fld = schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"docstore updateWhere: unknown field '$name'"))
      val ok = (v, fld.dataType) match {
        case (null, _) => true // $unset
        case (_: String, StringType) => true
        case (_: java.lang.Integer, IntegerType) => true
        case (_: java.lang.Long, LongType) => true
        case (_: java.lang.Double, DoubleType) => true
        case (_: java.lang.Boolean, BooleanType) => true
        case _ => false
      }
      if (!ok) throw new IllegalArgumentException(
        s"docstore updateWhere: value ${v} does not fit field '$name': ${fld.dataType.simpleString}")
    }

  /** Fields any prior shard tracked a bloom filter for — maintenance
    * rewrites re-track exactly these, so opt-in bloom indexing survives
    * delete/update/upsert/compact instead of silently washing out.
    */
  private def trackedBloomFields(stats: Map[String, DocStore.ShardStat]): Set[String] =
    stats.values.flatMap(_.fields.collect {
      case (name, st) if st.bloom.isDefined => name
    }).toSet

  /** The shared commit tail of every pruned rewrite (rewriteWhere and
    * upsert): fence zombie staged files, publish staged stats, write the
    * marker naming the exact swap, swap, clear the marker. One definition
    * so the recovery contract ([[recover]]'s marker parsing) can never
    * drift between the two call sites.
    */
  private def commitSwap(path: String, stagingId: String, toReplace: Set[String],
                         replacements: Map[String, DocStore.ShardStat],
                         priorStats: Map[String, DocStore.ShardStat]): Unit = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val stagingStr = new Path(dir, s".compact-$stagingId").toString
    DocStore.listParts(stagingStr).filterNot(p => replacements.contains(p.getName))
      .foreach(p => f.delete(p, false))
    DocStore.writeStats(stagingStr, (priorStats -- toReplace) ++ replacements)
    val markerPath = writeMarkerAtomic(f, dir, stagingId +: (toReplace.toSeq.sorted ++
        replacements.keys.toSeq.sorted.map("+" + _)))
    swap(path, stagingId, toReplace, Some(replacements.keySet))
    f.delete(markerPath, false)
  }

  /** Executor-side rewrite of one shard into staging. Returns the source
    * shard name, the staged (shardName → stats) replacement entry (None
    * when every document was deleted), and the matched-document count.
    */
  private def rewriteShard(dir: String, staging: String, shard: String,
                           schema: StructType, filters: Seq[Filter],
                           sets: Map[String, Any], delete: Boolean,
                           idx: Int, bloomFields: Set[String],
                           keyOf: Option[String] = None)
      : (String, Option[(String, DocStore.ShardStat)], Long, Seq[Any]) = {
    val src = new Path(dir, shard)
    val gz = shard.endsWith(".gz")
    val writer = new DocStoreWriter(staging, schema, partitionId = idx, taskId = 0L,
      jobTag = Some(if (delete) "del" else "upd"), gzip = gz, bloomFields = bloomFields)
    val mapper = new ObjectMapper()
    val fullIdx = schema.fields.map(fl => fl.name -> fl).toMap
    val matchesDoc = DocStoreFilters.compile(filters, fullIdx)
    var matched = 0L
    // matched-key collection for upsert's replace count: bounded by the
    // collected batch key set (only batch keys can match the In filter),
    // so this rides the rewrite pass instead of a second full read+parse
    // of every affected shard
    val keyType = keyOf.map(k => schema.fields.find(_.name == k).get.dataType)
    val matchedKeys = scala.collection.mutable.Set.empty[Any]
    // two-step assignment: the GZIP constructor reads the header eagerly
    // and can throw on a corrupt shard — `in` must already hold the raw
    // stream so the finally releases the fd
    var in: java.io.InputStream = DocStore.fs(src).open(src)
    try {
      if (gz) in = new java.util.zip.GZIPInputStream(in)
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
        if (line.nonEmpty) {
          val doc = mapper.readTree(line).asInstanceOf[ObjectNode]
          val isMatch = matchesDoc(doc)
          if (isMatch) {
            matched += 1
            keyOf.foreach { k =>
              val v = canonDocValue(doc.get(k), keyType.get)
              if (v != null) matchedKeys += v
            }
          }
          if (!(delete && isMatch)) {
            if (isMatch && !delete) applySets(doc, sets, schema)
            writer.write(rowOf(doc, schema))
          }
        }
      }
    } finally in.close()
    writer.commit() match {
      case DocStoreCommit(Some(file), Some(stat)) =>
        (shard, Some(new Path(file).getName -> stat), matched, matchedKeys.toSeq)
      case _ => (shard, None, matched, matchedKeys.toSeq)
    }
  }

  /** A document field value in the CANONICAL key form [[upsert]] uses for
    * replace-by-key counting: integrals widen to Long, zero doubles
    * normalize (-0.0 ≡ 0.0 — the store's equality), strings/booleans as
    * is. Must stay aligned with upsert's canonKey.
    */
  private def canonDocValue(n: com.fasterxml.jackson.databind.JsonNode,
                            dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (n == null || n.isNull) null
    else dt match {
      case StringType => n.asText()
      case IntegerType | LongType => java.lang.Long.valueOf(n.asLong())
      case DoubleType =>
        val d = n.asDouble()
        java.lang.Double.valueOf(if (d == 0.0) 0.0 else d)
      case BooleanType => java.lang.Boolean.valueOf(n.asBoolean())
      case _ => null
    }
  }

  private def applySets(doc: ObjectNode, sets: Map[String, Any], schema: StructType): Unit =
    sets.foreach { case (name, v) =>
      v match {
        case null => doc.remove(name) // absent ⇄ null
        case s: String => doc.put(name, s)
        case i: java.lang.Integer => doc.put(name, i.intValue())
        case l: java.lang.Long => doc.put(name, l.longValue())
        case d: java.lang.Double => doc.put(name, d.doubleValue())
        case b: java.lang.Boolean => doc.put(name, b.booleanValue())
        case other => throw new IllegalStateException(s"unreachable: $other") // validateSets gates
      }
    }

  private def rowOf(doc: ObjectNode, schema: StructType): InternalRow =
    new GenericInternalRow(schema.fields.map(fl =>
      DocStoreFilters.fieldValue(doc.get(fl.name), fl.dataType)))

  /** Roll a committed-but-unfinished swap forward, then clear pre-commit
    * staging garbage. Idempotent; safe to call on a healthy collection.
    *
    * SINGLE-MAINTENANCE-WRITER CONTRACT: the staging cleanup assumes no
    * OTHER maintenance op is concurrently in phase 1 on this collection —
    * a second op's recover() would delete the first's live staging dir
    * mid-prepare. Serialize maintenance per collection (the same rule
    * table formats enforce with a lock service this file deliberately
    * does not depend on); concurrent plain reads/appends are unaffected,
    * since staging is invisible to the shard listing.
    */
  private def recover(path: String): Unit = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val markerPath = new Path(dir, Marker)
    if (f.exists(markerPath)) {
      val in = f.open(markerPath)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      // "+"-prefixed lines (rewrite markers) name the exact replacement
      // files; compact markers have none and move everything staged.
      val (plus, olds) = content.tail.partition(_.startsWith("+"))
      val only = if (plus.nonEmpty) Some(plus.map(_.drop(1)).toSet) else None
      swap(path, content.head, olds.toSet, only)
      f.delete(markerPath, false)
    }
    f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(".compact-"))
      .foreach(p => f.delete(p, true))
    // Writer temp files (`.tmp-*`) from crashed tasks are invisible to
    // readers but otherwise accumulate forever (task abort deletes its
    // own temp only when the JVM survives). Maintenance ops run in a
    // writer-free window by contract (see the compact scaladoc) — but the
    // sweep is AGE-GATED so a contract violation degrades gracefully: a
    // concurrent writer's in-flight temp is at most minutes old and is
    // skipped (left as garbage for the next sweep) instead of deleted out
    // from under its mid-task write. Only temps old enough to be
    // provably-dead crash leftovers are removed.
    val tmpMinAgeMs = 15L * 60 * 1000
    val now = System.currentTimeMillis()
    f.listStatus(dir)
      .filter(s => (s.getPath.getName.startsWith(".tmp-") ||
          s.getPath.getName.startsWith(LeaseFile + ".inprogress")) &&
        now - s.getModificationTime > tmpMinAgeMs)
      .foreach(s => f.delete(s.getPath, false))
    // manifest write temps (writeFileAtomic in the commits dir) leak the
    // same way on a crash between create and rename — same aged sweep
    val cd = new Path(dir, DocStore.CommitsDir)
    if (f.exists(cd)) f.listStatus(cd)
      .filter(s => s.getPath.getName.startsWith(".tmp-") &&
        now - s.getModificationTime > tmpMinAgeMs)
      .foreach(s => f.delete(s.getPath, false))
  }

  /** Delete `oldShards` (those still present) and move the staged files of
    * `stagingId` into the collection, metadata last. `onlyFiles` restricts
    * the move to an explicit replacement list (the rewrite path's zombie
    * fence); None moves everything staged (compact). Idempotent:
    * re-running after a crash at any point completes the same end state.
    */
  private def swap(path: String, stagingId: String, oldShards: Set[String],
                   onlyFiles: Option[Set[String]] = None): Unit = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    val staging = new Path(dir, s".compact-$stagingId")
    // Superseded shards RETIRE (move to `_retired/`) instead of deleting
    // (r13): the version manifests referencing them stay readable — the
    // table-format model where a rewrite is a logical supersede and
    // physical reclamation is an explicit [[vacuum]] with a retention
    // horizon. Retire-then-move keeps the old no-lost-copy guarantee:
    // at no point is the only copy of a document unreachable.
    DocStore.listParts(path).filter(p => oldShards.contains(p.getName))
      .foreach(p => DocStore.retireShard(path, p.getName))
    if (f.exists(staging)) {
      DocStore.listParts(staging.toString)
        .filter(p => onlyFiles.forall(_.contains(p.getName)))
        .foreach { p =>
          if (!f.rename(p, new Path(dir, p.getName)))
            throw new java.io.IOException(s"compact: failed to move shard ${p.getName}")
        }
      // Metadata phase — MERGE-AWARE and under the JVM metadata lock
      // (r11): a commit that landed while the rewrite was staging has live
      // shards whose stats/schema entries the staged copies don't know
      // about. The pre-r11 wholesale file replace dropped them —
      // DocStoreConcurrencySpec's racing appenders measurably lost stats
      // (shards silently unpruned) and schema fields (physically
      // destructive at the next compact) to a concurrent maintenance op.
      // Stats entries are per-immutable-shard-file, so union + filter-to-
      // live is exact whichever side wins a name (names never collide);
      // idempotent under recover() roll-forward re-runs.
      DocStore.metadataLock.synchronized {
        val stagedStats = DocStore.readStats(staging.toString)
        val live = DocStore.listParts(path).map(_.getName).toSet
        val merged = (DocStore.readStats(path) ++ stagedStats)
          .filter { case (shard, _) => live.contains(shard) }
        DocStore.writeStats(path, merged)
        if (f.exists(new Path(staging, DocStore.SchemaFile)))
          DocStore.mergeStoredSchema(path, DocStore.readStoredSchema(staging.toString))
        f.delete(staging, true)
      }
    }
    // Maintenance preserves logical history (r13): the post-swap live set
    // becomes the NEXT version, prior versions keep reading through
    // `_retired/` (runs on recover() roll-forward too, so a crash between
    // swap and manifest cannot leave a stale log).
    DocStore.writeManifest(path, reset = false)
  }
}
