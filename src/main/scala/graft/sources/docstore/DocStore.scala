package graft.sources.docstore

import java.util.UUID

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage, SupportsTruncate}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Document-store source/sink: a full DataSource V2 connector.
  *
  * The reference persists parsed rows as schemaless documents in MongoDB
  * (`insert_mongo.py:9-15`: `collection.insert_many(records)`) and reads
  * them back with a projection (`stats_dashboard.py:13-16`:
  * `collection.find({}, {"_id": 0})`). No mongod exists in this sandbox, so
  * instead of a parquet stand-in this is a real connector with the same
  * semantics a document store gives you:
  *
  *   - documents are JSON objects; ABSENT fields read back as null, and
  *     null fields are written as absent (insert_many drops None the same
  *     way once pandas NaN is cleaned);
  *   - schema-on-read: the collection's schema travels in `_schema.json`
  *     (or is supplied externally via `.schema(...)`);
  *   - the dashboard's `find(filter, projection)` maps to Catalyst filter
  *     pushdown + column pruning: pushed filters are evaluated on the
  *     parsed document BEFORE rows are materialized, and only required
  *     fields are converted (`find`'s projection doc).
  *
  * Feature surface beyond the basic round-trip:
  *   - limit pushdown (`find().limit(n)`), per-shard early stop;
  *   - zone maps: per-shard/per-field min/max/non-null stats collected
  *     inline by writers, merged transactionally at commit, used for
  *     shard SKIPPING under pushed filters (parquet row-group skipping at
  *     shard granularity) and for stats-only COUNT/COUNT(col)/MIN/MAX
  *     aggregate pushdown (no shard opened);
  *   - per-shard BLOOM FILTERS (opt-in: `option("bloom.fields", "a,b")`):
  *     equality/IN shard skipping on high-cardinality fields whose values
  *     scatter across shards — the needle-in-haystack point lookup where
  *     every shard's min/max spans the whole domain and zone maps keep
  *     everything. ~10 bits/value, 7 probes (<1% false-positive keep);
  *     absence of a bloom always means keep, so readers of pre-bloom
  *     collections and maintenance rewrites stay sound;
  *   - Structured Streaming both ways: an epoch-idempotent streaming sink
  *     (replayed epochs replace their failed attempt's shards) and a
  *     micro-batch streaming source (change-stream over the append-only
  *     collection, offsets = seen-shard set);
  *   - gzip shard compression (`option("compression", "gzip")`), mixed
  *     plain/compressed collections read transparently;
  *   - SQL DDL (`CREATE TABLE ... USING docstore`);
  *   - offline compaction with a crash-safe two-phase marker protocol
  *     ([[DocStoreMaintenance]]).
  *
  * Consistency model, stated plainly (round-9 audit):
  *   - batch-write VISIBILITY is at TASK commit (each task renames its
  *     shard into the live listing as it finishes), not job commit. The
  *     window this opens: a driver killed between the last task commit
  *     and job commit leaves the committed tasks' shards live with no
  *     sweeper (no future job knows the dead job's tag), and a reader
  *     racing a job that later aborts can see its shards. The
  *     `_commits` manifest machinery already records per-commit shard
  *     sets — a deployment needing read-committed batch semantics gates
  *     every scan on the latest manifest (one metadata read per scan,
  *     and maintenance must then prune manifests); this repo's driver
  *     contract (single writer, crash = rebuild) takes the cheaper
  *     listing-based reads and this documented window.
  *   - a LONG-RUNNING streaming sink accrues per-epoch metadata: each
  *     epoch commit rewrites `_stats.json` for all shards and appends a
  *     full-shard-list manifest, and source offsets carry the seen-shard
  *     name set — O(shards) work per trigger, O(shards²) cumulative.
  *     Periodic `compact` shrinks the live set (fewer shards, fresh
  *     stats) and periodic [[DocStoreMaintenance.vacuum]] bounds the
  *     manifest log and reclaims retired bytes to the retention horizon;
  *     a production stream at high trigger rates would move to
  *     incremental stats sidecars + manifest deltas + high-water-mark
  *     offsets, none of which change the read or commit contracts above.
  *
  * Scale design: all I/O goes through the Hadoop FileSystem API, so the
  * same code runs against HDFS/S3 paths on a cluster. Reads plan one
  * InputPartition per part file (writers shard the collection, readers
  * parallelize over shards). Writes use the standard task-commit protocol
  * — each task writes a hidden temp file and renames it into place on
  * task commit — plus a job tag in every batch shard name so an aborted
  * job's already-committed shards are swept by name (task commits can
  * race past the driver's message collection). Overwrite deletes old
  * shards only at JOB commit, so a failed overwrite leaves the previous
  * collection intact. All value comparisons (filter eval, stats
  * accumulation, prune decisions) share ONE ordering that matches Spark's
  * semantics exactly: UTF-8 byte order for strings, exact long order for
  * integrals, NaN-largest/-0.0≡0.0 for doubles — Spark trusts pushed
  * filters, so any divergence would silently drop rows.
  *
  * Supported field types: STRING, INT, BIGINT, DOUBLE, BOOLEAN — the
  * document shapes the reference stores (all-nullable strings plus the
  * numeric columns of the rebuild's tables).
  */
class DocStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "docstore"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocStore.readStoredSchema(DocStore.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("docstore requires a 'path' option"))
    // Shards are task-scoped, not value-partitioned: silently accepting
    // PARTITIONED BY would drop the user's layout request (clustering is
    // the maintenance action `DocStoreMaintenance.cluster` instead).
    if (partitioning.nonEmpty)
      throw new IllegalArgumentException(
        s"docstore does not support PARTITIONED BY (got: ${partitioning.mkString(", ")}); " +
          "use DocStoreMaintenance.cluster for value clustering")
    DocStore.validateSchema(schema)
    new DocStoreTable(path, DocStore.allNullable(schema))
  }
}

private[docstore] object DocStore {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("docstore requires a 'path' option"))

  /** One Hadoop Configuration per JVM, honoring `spark.hadoop.*` overrides
    * (S3 credentials/endpoints, HDFS nameservices) the way Spark's own
    * sources do: a bare `new Configuration()` sees only classpath XML, so
    * the documented "same code against HDFS/S3 paths" claim would break on
    * any cluster configured through SparkConf. SparkEnv is present on both
    * driver and executors; building the conf once also keeps fs() cheap on
    * the per-reader/per-writer hot paths.
    */
  @transient private lazy val hadoopConf: Configuration = {
    val c = new Configuration()
    Option(org.apache.spark.SparkEnv.get).foreach { env =>
      env.conf.getAll.foreach { case (k, v) =>
        if (k.startsWith("spark.hadoop.")) c.set(k.stripPrefix("spark.hadoop."), v)
      }
    }
    c
  }

  def fs(path: Path): FileSystem = path.getFileSystem(hadoopConf)

  val SchemaFile = "_schema.json"

  /** Every docstore field is NULLABLE by construction: any document may
    * omit any field (absent ⇄ null), regardless of the nullability of the
    * DataFrame that happened to write first. Without this normalization a
    * non-nullable writer schema persists as DDL `NOT NULL`, and Catalyst
    * then constant-folds `IS NULL` on that field to an EMPTY relation —
    * wrong the moment any later write omits the field (found by
    * DocStoreCrudSpec's $unset test).
    */
  def allNullable(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))

  // The metadata helpers below (schema / stats / version manifests) each
  // take [[metadataLock]] INTERNALLY (reentrant, so locked call sites
  // nest freely): before r11 a same-JVM lock-free reader racing a locked
  // writer read back a TORN _schema.json (empty-DDL ParseException,
  // caught by DocStoreConcurrencySpec's racing writers).
  //
  // Since r15 every metadata WRITE is also atomic at the FILE level
  // ([[writeFileAtomic]]): the old create(overwrite)-in-place writes
  // truncated the destination first, so a PROCESS CRASH mid-write (not
  // just a racing thread) left a torn/empty _stats.json or _schema.json
  // that the loud read path then refused with a restore-by-hand recipe —
  // LeaseFuzzSpec's kill -9 landed exactly there on its first full-suite
  // run, turning a crash recover() must roll forward into manual
  // surgery. Now a kill at any instant leaves the destination as a
  // complete old or new version (plus at most an inert ".tmp-" file the
  // maintenance recover() sweeps age-gated).

  /** Write `bytes` to `p` atomically-in-effect: temp file in the same
    * directory (".tmp-" prefix — invisible to shard/version listings),
    * then rename over the destination. With `overwrite=false` the rename
    * is a create-once CLAIM (version allocation): returns false and
    * removes the temp when the destination already exists. The local
    * FS's overwrite rename is delete+rename emulation (see the lease
    * writer's note) — its microsecond absence window is invisible to
    * in-JVM readers (they share [[metadataLock]] with the writer) and
    * cross-process readers during maintenance are out of contract.
    *
    * The claim branch must NOT use FileSystem.rename (r16, advisory):
    * RawLocalFileSystem.rename delegates to java.io.File.renameTo, which
    * on POSIX silently REPLACES an existing destination — a lost version-
    * allocation race would clobber the winner's already-committed
    * manifest instead of failing. FileContext.rename with Rename.NONE
    * checks the destination and throws FileAlreadyExistsException, so the
    * loser correctly loses; the rare FileSystem fallback (schemeless
    * in-memory FS in tests) guards with an exists() check. Nor may the
    * claim branch touch the destination's .crc sidecar: a loser that
    * drops it strips checksum verification from a committed version it
    * never owned — the sidecar drop belongs to overwrite-in-place only.
    */
  /** Remove `p`'s Hadoop local-FS checksum sidecar (".<name>.crc") if
    * present. Checksummed local filesystems rename a file as TWO steps —
    * data, then crc — so a crash between them leaves the NEW data under
    * the OLD checksum, and every subsequent read dies on
    * ChecksumException ("restore by hand") even though the content is a
    * complete, valid version. Dropping the stale sidecar before the
    * rename makes the worst crash state "valid data, no checksum"
    * (which the FS reads unverified) instead of "valid data, wrong
    * checksum" (unreadable). On filesystems without sidecars (HDFS,
    * object stores) this is a no-op.
    */
  /** Test-only knob (r17): forces atomicRename down the Hadoop
    * FileContext / exists-guarded FileSystem fallback tiers even on the
    * local scheme, so the cross-JVM crash-fuzz suites can storm the paths
    * a real cluster's HDFS/object store would hit — the nio fast path
    * otherwise shadows them in every local test. Read once per JVM: set
    * -Dgraft.docstore.forceHadoopRename=true or GRAFT_FORCE_HADOOP_RENAME=1
    * before first docstore use (the env var is inherited by forked fuzz
    * peers automatically; never set in production sessions).
    */
  private[docstore] val forceHadoopRename: Boolean = {
    val on = java.lang.Boolean.getBoolean("graft.docstore.forceHadoopRename") ||
      sys.env.get("GRAFT_FORCE_HADOOP_RENAME").contains("1")
    // self-announcing so (a) a fuzz run can PROVE the knob engaged (a
    // vacuous forced-fallback sweep would silently re-test the nio path)
    // and (b) accidental production engagement is visible
    if (on) System.err.println("graft.docstore: FORCED Hadoop rename fallback (test knob)")
    on
  }

  private[docstore] def dropCrcSidecar(f: org.apache.hadoop.fs.FileSystem, p: Path): Unit = {
    val crc = new Path(p.getParent, s".${p.getName}.crc")
    try { if (f.exists(crc)) f.delete(crc, false) }
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Rename `tmp` onto `dst` with the strongest atomicity the platform
    * offers, carrying the checksum sidecar along. Returns false when
    * `overwrite=false` and the destination already exists (a lost claim —
    * the caller owns cleaning its temp), or when `overwrite=true` loses a
    * racing rename on the no-FileContext fallback path (retryable: the
    * lease writer's acquire loop depends on retry-on-false; r16 review
    * fix — the earlier throw here escaped that loop's catch and aborted
    * the whole op).
    *
    * Local scheme (r16): java.nio directly — `Files.move(ATOMIC_MOVE,
    * REPLACE_EXISTING)` is rename(2), a TRUE atomic replace (no
    * delete+rename gap, unlike AbstractFileSystem's overwrite emulation),
    * and `Files.createLink` is link(2), a TRUE atomic create-once claim
    * (no check-then-act window, unlike FileContext's exists-then-rename).
    * Stronger semantics AND ~10 forked processes cheaper per call: without
    * libhadoop, every FileContext.rename forks ~8 `readlink` processes for
    * link resolution (measured on this VM — the s16_docstore_erasure drift
    * row), where java.nio forks none. The crc sidecar moves as a second
    * step after the data, same order and crash window as ChecksumFs; a
    * kill between the steps leaves "valid data, no checksum" (readable)
    * because the overwrite path drops the stale destination sidecar first
    * and a claim's destination never had one.
    *
    * Remote schemes fall back to FileContext.rename (HDFS implements
    * OVERWRITE atomically server-side and NONE as an atomic claim), then
    * to an exists-guarded FileSystem.rename where no FileContext exists.
    *
    * DURABILITY CONTRACT (r17): atomicity here is against PROCESS failure
    * (kill -9 — the crash model StreamCrashFuzzSpec/LeaseFuzzSpec prove
    * across real JVMs), not power loss. No fsync of the file or its parent
    * directory is issued, so an OS/power crash can lose or reorder a
    * rename the process already observed. That is deliberate: the intended
    * deployment targets (HDFS, object stores) make the commit durable
    * server-side at the rename/PUT, where a client-side fsync is
    * meaningless — and on local runs (tests, single-node) the fs cache
    * flush latency window is accepted rather than paying a per-commit
    * fsync on every metadata write. A local deployment that needs
    * power-loss durability should mount the store with appropriate
    * journaling (data=ordered ext4 / ZFS) or add an external sync barrier.
    */
  private[docstore] def atomicRename(f: org.apache.hadoop.fs.FileSystem,
                                     tmp: Path, dst: Path,
                                     overwrite: Boolean): Boolean = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val qt = f.makeQualified(tmp)
    val qd = f.makeQualified(dst)
    if (qd.toUri.getScheme == "file" && !forceHadoopRename) {
      try {
        val t = Paths.get(qt.toUri.getPath)
        val d = Paths.get(qd.toUri.getPath)
        val tCrc = t.resolveSibling(s".${t.getFileName}.crc")
        val dCrc = d.resolveSibling(s".${d.getFileName}.crc")
        if (overwrite) {
          Files.move(t, d, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          // The data move IS the commit; the sidecar carry is best-effort
          // from here (r16 review: a sidecar-move failure that reached the
          // outer catch fell through to the Hadoop paths, which renamed an
          // already-consumed temp and misreported a COMMITTED write as
          // failed — or, worse, laundered a sidecar NoSuchFileException
          // into the semantic consumed-temp rethrow). A failure leaves
          // "valid data, no checksum" (readable): the caller dropped the
          // stale destination sidecar before calling.
          try {
            if (Files.exists(tCrc))
              Files.move(tCrc, dCrc, StandardCopyOption.ATOMIC_MOVE,
                StandardCopyOption.REPLACE_EXISTING)
          } catch { case scala.util.control.NonFatal(_) => () }
          return true
        } else {
          try Files.createLink(d, t) // link(2): atomically fails if d exists
          catch { case _: java.nio.file.FileAlreadyExistsException => return false }
          // data is claimed; the sidecar carry and temp cleanup are
          // best-effort from here — a failure leaves "valid data, no
          // checksum" (readable) plus an age-swept temp, never a state
          // where the winning claim gets misreported as lost
          try {
            try { if (Files.exists(tCrc)) Files.createLink(dCrc, tCrc) }
            catch { case _: java.nio.file.FileAlreadyExistsException =>
              // a dataless orphan sidecar (possible only after a crashed
              // out-of-protocol delete) — ours is the valid one now
              Files.move(tCrc, dCrc, StandardCopyOption.ATOMIC_MOVE,
                StandardCopyOption.REPLACE_EXISTING)
            }
            Files.deleteIfExists(t)
            Files.deleteIfExists(tCrc)
          } catch { case scala.util.control.NonFatal(_) => () }
          return true
        }
      } catch {
        // A consumed temp is SEMANTIC (the lease writer's retry re-reads
        // ownership on it) and must not be laundered into a fallback
        // rename that would throw something else — propagate.
        case e: java.nio.file.NoSuchFileException => throw e
        // Everything else filesystem-shaped (no hard links on this mount:
        // EPERM/ENOTSUP surface as FileSystemException, not
        // UnsupportedOperationException; AtomicMoveNotSupported likewise)
        // falls through to the Hadoop paths below, which r15 shipped on.
        case _: UnsupportedOperationException =>
        case _: java.nio.file.FileSystemException =>
      }
    }
    if (overwrite) {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(qd.toUri, f.getConf)
        fc.rename(qt, qd, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // a false return is a retryable lost race, not an error: the
          // lease writer's acquire loop depends on retry-on-false here
          // (writeFileAtomic escalates false to IOException itself)
          if (f.exists(dst)) f.delete(dst, false)
          f.rename(tmp, dst)
      }
    } else {
      // An orphan destination sidecar (data absent — possible only after a
      // crashed out-of-protocol delete) both poisons later checksummed
      // reads AND makes ChecksumFs's crc carry throw a spurious
      // FileAlreadyExists AFTER the data already renamed in. Drop it
      // before claiming, as the nio branch does at link time (r16 review).
      // Racing a concurrent winner here at worst deletes THEIR fresh
      // sidecar — "valid data, no checksum" (readable), never corruption.
      // Checksummed filesystems only (r17 review): on HDFS/object stores
      // sidecars cannot exist, and the guard would cost two getFileStatus
      // RPCs on EVERY versioned claim commit.
      if (f.isInstanceOf[org.apache.hadoop.fs.ChecksumFileSystem])
        try { if (!f.exists(dst)) dropCrcSidecar(f, dst) }
        catch { case scala.util.control.NonFatal(_) => () }
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(qd.toUri, f.getConf)
        fc.rename(qt, qd, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no FileContext for this scheme: exists-guarded FileSystem
          // rename. The guard is check-then-act, but losing THIS race
          // needs a committer to land between the two calls — and a
          // destination appearing concurrently is still a lost claim,
          // never a clobber-worthy one, because callers retry with the
          // next version on false.
          if (f.exists(dst)) false
          else
            try f.rename(tmp, dst)
            catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      }
    }
  }

  private[docstore] def writeFileAtomic(p: Path, bytes: Array[Byte],
                                        overwrite: Boolean = true): Boolean = {
    val f = fs(p)
    val tmp = new Path(p.getParent, s".tmp-meta-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (overwrite) {
      dropCrcSidecar(f, p)
      // single-writer context (metadataLock / the lease): a false here is
      // not a racing committer but a real failure — loud, like the old
      // in-place path
      if (!atomicRename(f, tmp, p, overwrite = true))
        throw new java.io.IOException(s"atomic metadata write failed: $tmp -> $p")
      true
    } else {
      val ok = atomicRename(f, tmp, p, overwrite = false)
      if (!ok && f.exists(tmp)) f.delete(tmp, false)
      ok
    }
  }

  def readStoredSchema(dir: String): StructType = metadataLock.synchronized {
    val p = new Path(dir, SchemaFile)
    val f = fs(p)
    if (!f.exists(p))
      throw new IllegalArgumentException(
        s"docstore collection at $dir has no $SchemaFile; write first or pass .schema(...)")
    val ddl =
      try {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"docstore $SchemaFile at $dir is corrupt or torn — unreadable " +
            s"(${e.getMessage}). Restore the file, or rewrite it via an explicit " +
            "overwrite with the intended schema in a writer-free window.", e)
      }
    // torn/corrupt schema DDL: fail with the file and a recipe, not a
    // bare parser error — and never infer a schema (a guessed schema
    // reads documents of the true schema back corrupted)
    try allNullable(StructType.fromDDL(ddl)) // older collections may store NOT NULL
    catch { case e: Exception =>
      throw new IllegalStateException(
        s"docstore $SchemaFile at $dir is corrupt or torn — cannot parse " +
          s"'${ddl.take(80)}' as a DDL schema (${e.getMessage}). Restore the " +
          "file, or rewrite it via an explicit overwrite with the intended " +
          "schema in a writer-free window.", e)
    }
  }

  def writeStoredSchema(dir: String, schema: StructType): Unit = metadataLock.synchronized {
    writeFileAtomic(new Path(dir, SchemaFile),
      allNullable(schema).toDDL.getBytes("UTF-8"))
  }

  /** Serializes every commit's METADATA phase (stats + version manifest +
    * schema) within this JVM. Commits run on the Spark DRIVER, and the
    * only supported concurrent-committer scenario — several queries
    * writing one collection — shares that driver, so a JVM lock makes the
    * read-modify-writes of `_stats.json`/`_schema.json` and the version
    * allocation atomic where it matters: without it, two same-instant
    * epoch commits could each read the prior stats/schema and the loser's
    * write would DROP the winner's entries (a lost schema field is then
    * physically destructive at the next compact). Concurrent commits from
    * SEPARATE processes are out of contract, as for any file-format store
    * without a lock service (see DocStoreMaintenance's
    * single-maintenance-writer note).
    */
  private[docstore] val metadataLock = new Object

  /** Persist the collection schema for an APPEND commit: the stored schema
    * becomes the UNION of every writer's fields (absent ⇄ null, the
    * store's native semantics), so an append that selects a SUBSET of
    * columns can never hide previously-written fields from later reads —
    * or worse, from a compaction, which rewrites documents through the
    * stored schema and would physically delete the hidden values. A
    * RETYPED field fails loudly instead (old zone-map stats and documents
    * of the other type would read back corrupted): retyping a collection
    * requires an explicit overwrite, which replaces the schema via
    * [[writeStoredSchema]]. Union-merging is also what lets two streaming
    * queries with different column sets share one collection without the
    * schema flip-flopping every epoch.
    */
  def mergeStoredSchema(dir: String, schema: StructType): Unit =
    writeStoredSchema(dir, mergedSchemaFor(dir, schema))

  /** The union-merged schema an append will persist — callable BEFORE any
    * data is written so a retyped append fails before staging shards.
    */
  def mergedSchemaFor(dir: String, schema: StructType): StructType = {
    val p = new Path(dir, SchemaFile)
    if (!fs(p).exists(p)) allNullable(schema)
    else {
      val stored = readStoredSchema(dir)
      // match CASE-INSENSITIVELY: Spark resolves columns that way by
      // default, but the store's JSON document keys are case-sensitive —
      // so a case-variant of a stored field would either merge into an
      // AMBIGUOUS_REFERENCE pair or write docs whose keys the stored
      // schema can't read back. Reject both loudly.
      val storedByLower = stored.fields.map(f => f.name.toLowerCase -> f).toMap
      schema.fields.foreach { fld =>
        storedByLower.get(fld.name.toLowerCase).foreach { s =>
          if (s.name != fld.name) throw new IllegalArgumentException(
            s"docstore append writes field '${fld.name}', a case-variant of stored " +
              s"field '${s.name}' — document keys are case-sensitive; rename the " +
              "column to match exactly")
          if (s.dataType != fld.dataType) throw new IllegalArgumentException(
            s"docstore append retypes field '${fld.name}' from ${s.dataType.simpleString} " +
              s"to ${fld.dataType.simpleString}; retyping requires mode(\"overwrite\")")
        }
      }
      val storedNames = stored.fieldNames.toSet
      StructType(stored.fields ++
        schema.fields.filterNot(f => storedNames.contains(f.name)).map(_.copy(nullable = true)))
    }
  }

  def validateSchema(schema: StructType): Unit = schema.fields.foreach { fld =>
    fld.dataType match {
      case StringType | IntegerType | LongType | DoubleType | BooleanType => ()
      case dt => throw new IllegalArgumentException(
        s"docstore does not support field '${fld.name}' of type ${dt.simpleString}; " +
          "supported: string, int, bigint, double, boolean")
    }
  }

  /** Shard files of the collection, sorted for deterministic planning. */
  def listParts(dir: String): Array[Path] = {
    val d = new Path(dir)
    val f = fs(d)
    if (!f.exists(d)) Array.empty
    else f.listStatus(d).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") &&
        (p.getName.endsWith(".jsonl") || p.getName.endsWith(".jsonl.gz")))
      .sortBy(_.getName)
  }

  // ---- retired shards (superseded-but-retained physical history) ----------

  /** Shards superseded by a maintenance rewrite live here until
    * [[DocStoreMaintenance.vacuum]] reclaims them: out of the live listing
    * (so scans and stats never see them) but still resolvable by snapshot
    * reads of the versions that reference them.
    */
  val RetiredDir = "_retired"

  /** Move a superseded live shard into `_retired/`. Idempotent for the
    * recovery roll-forward: a shard already retired (source gone) is a
    * no-op, and if the retired name already exists — possible only when a
    * late at-least-once epoch replay re-created a name an earlier
    * maintenance pass already retired — the first-retired copy wins and
    * the source is dropped (snapshot reads of replayed epochs are
    * documented loud/approximate under the at-least-once caveat).
    */
  def retireShard(dir: String, name: String): Unit = {
    val src = new Path(dir, name)
    val f = fs(src)
    if (f.exists(src)) {
      val rd = new Path(dir, RetiredDir)
      if (!f.exists(rd)) f.mkdirs(rd)
      val dst = new Path(rd, name)
      if (f.exists(dst)) f.delete(src, false)
      else if (!f.rename(src, dst))
        throw new java.io.IOException(s"docstore: failed to retire shard $name in $dir")
    }
  }

  /** The retired shard files (empty when nothing was ever retired). */
  def listRetired(dir: String): Array[Path] = {
    val rd = new Path(dir, RetiredDir)
    val f = fs(rd)
    if (!f.exists(rd)) Array.empty
    else f.listStatus(rd).map(_.getPath).sortBy(_.getName)
  }

  // ---- commit manifests (snapshot reads / time travel) --------------------

  val CommitsDir = "_commits"

  /** Version manifests: every committed write appends `_commits/v%06d.json`
    * holding the full live shard list at that commit, so
    * `option("version", n)` re-reads EXACTLY the collection a past commit
    * produced — the reproducible-corpus primitive ("train on snapshot v3")
    * a training pipeline audits against. Append-only workloads (the
    * store's native insert_many / streaming-epoch mode) keep every
    * snapshot readable. Since r13 the maintenance rewrites
    * (compact/cluster/delete/update/upsert) PRESERVE history too: the
    * shards they supersede move to `_retired/` (invisible to the live
    * listing, still resolvable by snapshot reads) and the log gains a new
    * version instead of resetting — the table-format model where logical
    * deletes are metadata and physical reclamation is an explicit
    * [[DocStoreMaintenance.vacuum]] with a retention horizon. Only an
    * explicit OVERWRITE still rewrites physical history and resets the
    * log to v1: the store keeps ONE schema, and an overwrite may retype
    * it, so reading pre-overwrite documents through the new schema would
    * be corruption — the reset makes that impossible by construction.
    * A read of a vacuumed (or overwrite-reset) version fails loudly
    * rather than returning a half-snapshot.
    */
  def listVersions(dir: String): Seq[Int] = metadataLock.synchronized {
    val d = new Path(dir, CommitsDir)
    val f = fs(d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted.toSeq
  }

  def readManifest(dir: String, version: Int): Seq[String] = metadataLock.synchronized {
    val p = new Path(new Path(dir, CommitsDir), f"v$version%06d.json")
    val f = fs(p)
    if (!f.exists(p)) {
      val avail = listVersions(dir)
      // name the CAUSE, not just the absence: a version below the earliest
      // retained manifest was dropped by vacuum's retention horizon (or an
      // overwrite reset the log) — the reader must learn that loudly, never
      // see an empty or partial snapshot in its place
      val hint =
        if (avail.nonEmpty && version >= 1 && version < avail.head)
          s"; version $version is below the earliest retained manifest — it was dropped by " +
            "vacuum(retainVersions) or an overwrite reset the log"
        else ""
      throw new IllegalArgumentException(
        s"docstore $dir has no version $version (available: ${avail.mkString(", ")})$hint")
    }
    val txt =
      try {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          f"docstore version manifest v$version%06d at $dir is corrupt or torn — " +
            s"unreadable (${e.getMessage}). Pick an intact version from " +
            s"${listVersions(dir).mkString(", ")} or repair the manifest by hand.", e)
      }
    // a torn version manifest names itself: a silent empty shard list
    // would present a valid-looking EMPTY collection at that version —
    // time-travel reads returning zero rows instead of an error
    val arr =
      try {
        val node = new ObjectMapper().readTree(txt)
        val shards = if (node == null) null else node.get("shards")
        if (shards == null || !shards.isArray)
          throw new IllegalStateException("no 'shards' array")
        shards
      } catch { case e: Exception =>
        throw new IllegalStateException(
          f"docstore version manifest v$version%06d at $dir is corrupt or torn " +
            s"(${e.getMessage}). Pick an intact version from " +
            s"${listVersions(dir).mkString(", ")} or repair the manifest by hand.", e)
      }
    (0 until arr.size()).map(arr.get(_).asText())
  }

  /** Append the next version manifest recording the current live shard
    * set. Called from every commit AFTER data+stats land (metadata-last
    * discipline). `reset` wipes the log first (overwrite/maintenance).
    */
  def writeManifest(dir: String, reset: Boolean): Unit = metadataLock.synchronized {
    val cd = new Path(dir, CommitsDir)
    val f = fs(cd)
    if (reset && f.exists(cd)) f.delete(cd, true)
    if (!f.exists(cd)) f.mkdirs(cd)
    // Version allocation races when two committers land in the same
    // instant (two streaming queries sharing a collection — a supported
    // setup — or a streaming epoch beside a batch append). Same-JVM
    // committers — the supported case — are serialized by metadataLock at
    // the commit sites. The retry below is belt for CROSS-process
    // committers on stores whose create(overwrite=false) is an atomic
    // claim (HDFS O_EXCL; note RawLocalFileSystem's is exists-then-open,
    // one reason cross-process commits are out of contract): on collision
    // re-list and take the next number instead of failing the commit.
    // Bounded attempts: each loss means another committer PROGRESSED, so
    // livelock would need 64 commits in the window of one — at that point
    // something is pathologically wrong and loud beats silent.
    var attempt = 0
    var done = false
    while (!done) {
      val next = listVersions(dir).lastOption.getOrElse(0) + 1
      val root = JsonNodeFactory.instance.objectNode()
      val arr = root.putArray("shards")
      listParts(dir).map(_.getName).foreach(arr.add)
      val p = new Path(cd, f"v$next%06d.json")
      // temp+rename (r15): the old direct create(overwrite=false) was an
      // atomic CLAIM but not an atomic WRITE — a process crash between
      // create and close left a truncated manifest that readManifest
      // refuses with a repair-by-hand recipe. The rename keeps the claim
      // semantics (fails when the version already exists → retry next
      // number) while the content lands complete or not at all.
      done = writeFileAtomic(p,
        new ObjectMapper().writeValueAsString(root).getBytes("UTF-8"),
        overwrite = false)
      if (!done) {
        attempt += 1
        if (attempt >= 64) throw new java.io.IOException(
          s"docstore version allocation lost $attempt straight races at $dir")
      }
    }
  }

  // ---- shard statistics (zone maps) ---------------------------------------

  val StatsFile = "_stats.json"

  /** Per-shard, per-field zone map: min/max over NON-NULL values plus the
    * non-null count (and the shard's row count) — the parquet row-group
    * statistics idea applied to document shards. Collected inline by each
    * writer, merged at commit, used by the scan planner to skip whole
    * shards a pushed filter can never match. `bloom` (opt-in per field via
    * the `bloom.fields` write option) extends skipping to EQUALITY/IN
    * predicates on fields whose values are scattered across shards —
    * the needle-in-haystack point lookup min/max can never prune.
    */
  final case class FieldStat(min: Any, max: Any, nonNull: Long,
                             bloom: Option[Bloom] = None) extends Serializable
  final case class ShardStat(count: Long, fields: Map[String, FieldStat]) extends Serializable

  /** Per-shard bloom filter over one field's non-null values. m = bits
    * length × 64 is a power of two; membership uses double hashing
    * (h1 + i·h2 mod m, Kirsch–Mitzenmacher) over canonical value bytes.
    * Absence of a bloom (or a non-canonicalizable literal) always means
    * KEEP the shard — pruning only ever happens on positive evidence.
    */
  final case class Bloom(k: Int, bits: Array[Long]) extends Serializable {
    def m: Int = bits.length * 64
    def mightContain(pair: Long): Boolean = {
      val h1 = pair >>> 32
      val h2 = pair & 0xffffffffL
      val mask = (m - 1).toLong
      var i = 0
      while (i < k) {
        val idx = ((h1 + i.toLong * h2) & mask).toInt
        if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  object Bloom {
    /** ~10 bits per value with 7 probes ⇒ false-positive rate under 1%. */
    val BitsPerValue = 10
    val Hashes = 7
    val MaxBits: Int = 1 << 26 // 8 MB cap per (shard, field)

    /** Value count at which [[build]] saturates to `m = MaxBits`: past it,
      * buffering more hash pairs costs writer heap (8 B/value, unbounded
      * on a huge shard) for ZERO sizing benefit — the writer freezes the
      * max-size filter there and inserts the rest directly ([[insert]]).
      */
    val SaturationCount: Int = MaxBits / BitsPerValue

    /** Canonical (h1,h2) packed pair for a value, or None when the value's
      * type has no canonical byte form. The WRITER hashes values boxed per
      * the declared schema type; the PRUNER hashes filter literals — both
      * must canonicalize identically, so integrals hash their 8-byte long
      * form (an Int literal against a BIGINT column matches) and doubles
      * hash normalized IEEE bits (-0.0 ≡ 0.0, Spark's equality).
      */
    def hashPair(v: Any): Option[Long] = {
      val bytes: Array[Byte] = v match {
        case s: String => s.getBytes("UTF-8")
        case i: java.lang.Integer => longBytes(i.longValue())
        case l: java.lang.Long => longBytes(l.longValue())
        case d: java.lang.Double =>
          val n = if (d.doubleValue() == 0.0) 0.0 else d.doubleValue()
          longBytes(java.lang.Double.doubleToLongBits(n))
        case b: java.lang.Boolean => Array[Byte](if (b.booleanValue()) 1 else 0)
        case _ => return None
      }
      val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x0b100f17)
      val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x5eed5a1d)
      Some((h1.toLong << 32) | (h2.toLong & 0xffffffffL))
    }

    private def longBytes(l: Long): Array[Byte] = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
      b
    }

    /** Type family guard for pruning: a literal may consult the bloom only
      * when its runtime family matches the written values' family (exemplar
      * = the shard's schema-coerced min) — a DOUBLE literal pushed against
      * a BIGINT column canonicalizes differently, and a false negative
      * there would silently drop rows. Mismatch ⇒ keep the shard.
      */
    def family(x: Any): Int = x match {
      case _: String => 1
      case _: java.lang.Integer | _: java.lang.Long => 2
      case _: java.lang.Double => 3
      case _: java.lang.Boolean => 4
      case _ => 0
    }

    /** Build from `n` buffered hash pairs; sized to the next power of two
      * ≥ BitsPerValue·n (duplicates inflate n, which only LOWERS the
      * false-positive rate — never unsound).
      */
    def build(pairs: Array[Long], n: Int): Bloom = {
      var m = 1024
      while (m < n.toLong * BitsPerValue && m < MaxBits) m <<= 1
      val bits = new Array[Long](m >>> 6)
      val mask = (m - 1).toLong
      var j = 0
      while (j < n) {
        val h1 = pairs(j) >>> 32
        val h2 = pairs(j) & 0xffffffffL
        var i = 0
        while (i < Hashes) {
          val idx = ((h1 + i.toLong * h2) & mask).toInt
          bits(idx >>> 6) |= (1L << (idx & 63))
          i += 1
        }
        j += 1
      }
      Bloom(Hashes, bits)
    }

    /** Mutating insert for the saturated-writer path — same double
      * hashing and mask as [[build]], so membership is identical whether
      * a pair was buffered or inserted directly.
      */
    def insert(b: Bloom, pair: Long): Unit = {
      val h1 = pair >>> 32
      val h2 = pair & 0xffffffffL
      val mask = (b.m - 1).toLong
      var i = 0
      while (i < Hashes) {
        val idx = ((h1 + i.toLong * h2) & mask).toInt
        b.bits(idx >>> 6) |= (1L << (idx & 63))
        i += 1
      }
    }

    def toBase64(b: Bloom): String = {
      val buf = java.nio.ByteBuffer.allocate(8 * b.bits.length)
      b.bits.foreach(buf.putLong)
      java.util.Base64.getEncoder.encodeToString(buf.array())
    }

    def fromBase64(k: Int, s: String): Bloom = {
      val bytes = java.util.Base64.getDecoder.decode(s)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val bits = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < bits.length) { bits(i) = buf.getLong(); i += 1 }
      Bloom(k, bits)
    }
  }

  /** Total order used by the filter evaluator, the stats accumulators, and
    * the prune decisions — ONE definition so the three can never diverge
    * (a pruning order differing from the evaluation order makes zone maps
    * unsound), and each case matches SPARK's order, because Spark trusts
    * pushed filters and does not re-check rows:
    *   - strings compare as UTF-8 BYTES (UTF8String order), not UTF-16
    *     code units — String.compareTo would misorder supplementary
    *     characters (emoji) against [U+0800, U+FFFF] text;
    *   - integral/integral compares exactly in long space (a double detour
    *     would collapse bigints differing only beyond 2^53);
    *   - a floating operand compares in double space with -0.0 normalized
    *     to 0.0 first (Spark treats them equal) and Double.compare's
    *     NaN-largest order (matches Spark's NaN ordering).
    */
  def cmpValues(x: Any, v: Any): Option[Int] = (x, v) match {
    case (null, _) | (_, null) => None
    case (a: String, b: String) =>
      Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
    case (a: Number, b: Number) =>
      val integral = (n: Number) => n.isInstanceOf[java.lang.Long] || n.isInstanceOf[java.lang.Integer]
      if (integral(a) && integral(b)) Some(java.lang.Long.compare(a.longValue(), b.longValue()))
      else {
        def norm(d: Double) = if (d == 0.0) 0.0 else d // -0.0 == 0.0 in Spark
        Some(java.lang.Double.compare(norm(a.doubleValue()), norm(b.doubleValue())))
      }
    case _ => None
  }

  /** Schema-aware stats read: coerces each field's min/max to its DECLARED
    * type — the JSON round-trip reads every integral as Long (an int
    * column's stats must come back Int or a pushed MIN/MAX row would carry
    * the wrong box), and non-finite doubles travel as the sentinel strings
    * "NaN"/"Infinity"/"-Infinity" (Jackson has no literal for them), which
    * must parse back to doubles for a double column. Fields absent from
    * the schema pass through unchanged.
    */
  def readStats(dir: String, schema: StructType): Map[String, ShardStat] = {
    def coerce(x: Any, dt: DataType): Any = (x, dt) match {
      case (null, _) => null
      case (n: Number, IntegerType) => Int.box(n.intValue())
      case (n: Number, LongType) => Long.box(n.longValue())
      case (n: Number, DoubleType) => Double.box(n.doubleValue())
      case (s: String, DoubleType) => Double.box(s.toDouble) // NaN / ±Infinity sentinels
      case (other, _) => other
    }
    readStats(dir).map { case (shard, st) =>
      shard -> st.copy(fields = st.fields.map { case (name, fst) =>
        schema.fields.find(_.name == name) match {
          case Some(fld) => name -> FieldStat(
            coerce(fst.min, fld.dataType), coerce(fst.max, fld.dataType), fst.nonNull,
            fst.bloom)
          case None => name -> fst
        }
      })
    }
  }

  def readStats(dir: String): Map[String, ShardStat] = metadataLock.synchronized {
    val p = new Path(dir, StatsFile)
    val f = fs(p)
    if (!f.exists(p)) return Map.empty
    // the read itself can fail on corruption BEFORE any parsing — e.g.
    // a filesystem-level checksum mismatch (Hadoop's LocalFileSystem crc
    // sidecars) on a file scribbled by partial storage failure — and
    // must carry the same artifact-named diagnosis as a parse failure
    val txt =
      try {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"docstore $StatsFile at $dir is corrupt or torn — unreadable " +
            s"(${e.getMessage}). Refusing to guess: a corrupt stats ledger must " +
            "surface before pruning trusts it or maintenance mistakes the " +
            "collection for a legacy stats-less one. Restore the file from the " +
            "last commit, or delete it and run compact in a writer-free window " +
            "to rebuild.", e)
      }
    // A torn or corrupt stats file fails LOUDLY with its path and a
    // recovery recipe — never a corrupt-as-empty fallback. A MISSING
    // stats file is the documented legacy path (scan everything, prune
    // nothing), but CORRUPT is different in kind: compact uses stats as
    // the committed-shard ledger (a corrupt file read back as empty
    // would send it down the legacy rewrite-everything path against a
    // possibly-live writer), and pruning decisions must never run on a
    // half-parsed ledger. At 100 TB partial metadata corruption is a
    // when, not an if (DocStorePropSpec's fault-injection cases pin
    // this contract).
    val root =
      try new ObjectMapper().readTree(txt)
      catch { case e: Exception =>
        throw new IllegalStateException(
          s"docstore $StatsFile at $dir is corrupt or torn (${e.getMessage}). " +
            "Refusing to guess: a corrupt stats ledger must surface before " +
            "pruning trusts it or maintenance mistakes the collection for a " +
            "legacy stats-less one. Restore the file from the last commit, or — " +
            "in a writer-free window — delete it and run compact to rebuild " +
            "from the surviving shards.", e)
      }
    if (root == null || !root.isObject)
      throw new IllegalStateException(
        s"docstore $StatsFile at $dir is corrupt: expected a JSON object of " +
          s"per-shard stats, found ${if (root == null) "empty content" else root.getNodeType}. " +
          "Restore from the last commit, or delete it and run compact in a " +
          "writer-free window to rebuild.")
    def v(n: JsonNode): Any =
      if (n == null || n.isNull) null
      else if (n.isTextual) n.asText()
      else if (n.isBoolean) n.asBoolean()
      else if (n.isIntegralNumber) n.asLong()
      else n.asDouble()
    val out = Map.newBuilder[String, ShardStat]
    // same loud-failure contract for STRUCTURALLY broken entries (a
    // well-formed-JSON file whose shard entry lost `count`, or a bloom
    // whose base64 was mangled): name the shard entry, never guess
    try root.fieldNames().asScala.foreach { shard =>
      val s = root.get(shard)
      val fields = Map.newBuilder[String, FieldStat]
      val fn = s.get("fields")
      if (fn != null) fn.fieldNames().asScala.foreach { fld =>
        val e = fn.get(fld)
        val bloom = Option(e.get("bloom")).filterNot(_.isNull).map { bn =>
          Bloom.fromBase64(bn.get("k").asInt(), bn.get("bits").asText())
        }
        fields += fld -> FieldStat(v(e.get("min")), v(e.get("max")),
          e.get("nonNull").asLong(), bloom)
      }
      val cnt = s.get("count")
      if (cnt == null || !cnt.isIntegralNumber)
        throw new IllegalStateException(s"shard entry '$shard' has no integral 'count'")
      out += shard -> ShardStat(cnt.asLong(), fields.result())
    } catch {
      case e: IllegalStateException if e.getMessage.startsWith("docstore") => throw e
      case e: Exception =>
        throw new IllegalStateException(
          s"docstore $StatsFile at $dir is structurally corrupt (${e.getMessage}). " +
            "Restore from the last commit, or delete it and run compact in a " +
            "writer-free window to rebuild.", e)
    }
    out.result()
  }

  def writeStats(dir: String, stats: Map[String, ShardStat]): Unit = metadataLock.synchronized {
    val root = JsonNodeFactory.instance.objectNode()
    def put(o: ObjectNode, k: String, x: Any): Unit = x match {
      case null => o.putNull(k)
      case s: String => o.put(k, s)
      case b: java.lang.Boolean => o.put(k, b.booleanValue())
      case i: java.lang.Integer => o.put(k, i.longValue())
      case l: java.lang.Long => o.put(k, l.longValue())
      case d: java.lang.Double =>
        // Jackson has no JSON literal for non-finite doubles; store the
        // Double.toString sentinel, re-parsed by the schema-aware read.
        if (d.isNaN || d.isInfinite) o.put(k, d.toString) else o.put(k, d.doubleValue())
      case other => o.put(k, other.toString)
    }
    stats.toSeq.sortBy(_._1).foreach { case (shard, s) =>
      val sn = root.putObject(shard)
      sn.put("count", s.count)
      val fn = sn.putObject("fields")
      s.fields.toSeq.sortBy(_._1).foreach { case (fld, fs_) =>
        val e = fn.putObject(fld)
        put(e, "min", fs_.min); put(e, "max", fs_.max); e.put("nonNull", fs_.nonNull)
        fs_.bloom.foreach { b =>
          val bn = e.putObject("bloom")
          bn.put("k", b.k); bn.put("bits", Bloom.toBase64(b))
        }
      }
    }
    writeFileAtomic(new Path(dir, StatsFile),
      new ObjectMapper().writeValueAsString(root).getBytes("UTF-8"))
  }

  /** True when `filter` can be satisfied by SOME document in a shard with
    * these stats — false means the planner may skip the shard. Sound under
    * nulls: min/max cover non-null values only, and no comparison filter
    * accepts a null. A field entirely absent from the stats map means the
    * writer predates stats or the field was never non-null AND never
    * tracked — keep the shard (prune only on positive evidence).
    */
  def shardMayMatch(filter: Filter, stat: ShardStat): Boolean = {
    def fs_(a: String): Option[FieldStat] = stat.fields.get(a)
    def lt(x: Any, y: Any): Boolean = cmpValues(x, y).exists(_ < 0)
    def le(x: Any, y: Any): Boolean = cmpValues(x, y).exists(_ <= 0)
    // Bloom admission for an equality literal: prune only when the shard
    // HAS a bloom for the field, the literal's type family matches the
    // written values' (exemplar = schema-coerced min), AND every probed bit
    // is clear. Any uncertainty keeps the shard.
    def admits(s: FieldStat, v: Any): Boolean = s.bloom match {
      case None => true
      case Some(b) =>
        val fam = Bloom.family(v)
        if (fam == 0 || fam != Bloom.family(s.min)) true
        else Bloom.hashPair(v).forall(b.mightContain)
    }
    filter match {
      case EqualTo(a, v) => fs_(a).forall(s =>
        s.nonNull > 0 && le(s.min, v) && le(v, s.max) && admits(s, v))
      case In(a, vs) => fs_(a).forall(s =>
        s.nonNull > 0 && vs.exists(v => le(s.min, v) && le(v, s.max) && admits(s, v)))
      case GreaterThan(a, v) => fs_(a).forall(s => s.nonNull > 0 && lt(v, s.max))
      case GreaterThanOrEqual(a, v) => fs_(a).forall(s => s.nonNull > 0 && le(v, s.max))
      case LessThan(a, v) => fs_(a).forall(s => s.nonNull > 0 && lt(s.min, v))
      case LessThanOrEqual(a, v) => fs_(a).forall(s => s.nonNull > 0 && le(s.min, v))
      case IsNotNull(a) => fs_(a).forall(_.nonNull > 0)
      case IsNull(a) => fs_(a).forall(s => s.nonNull < stat.count)
      case StringStartsWith(a, prefix) => fs_(a).forall { s =>
        // any s with the prefix satisfies s >= prefix, so max < prefix
        // proves no match; the min-side bound needs a prefix-successor
        // computation — not worth the subtlety, keep the shard.
        // The comparison MUST use the same UTF-8 byte order the stats were
        // collected under (cmpValues): String.compareTo is UTF-16 code-unit
        // order, which disagrees for supplementary-plane characters
        // (an emoji max sorts above U+FFFF in UTF-8 but below it in
        // UTF-16), and an order mismatch here silently prunes a shard
        // that contains matching rows.
        s.nonNull > 0 && (s.max match {
          case mx: String => DocStore.cmpValues(mx, prefix).forall(_ >= 0)
          case _ => true
        })
      }
      case _ => true
    }
  }
}

private[docstore] class DocStoreTable(path: String, schema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  override def name(): String = s"docstore:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava

  // SQL `DELETE FROM <docstore table> WHERE ...`: filter-based deletes
  // delegate to the zone-map-pruned crash-safe rewrite (delete_many).
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(DocStoreFilters.supported(schema, _))
  override def deleteWhere(filters: Array[Filter]): Unit =
    DocStoreMaintenance.deleteWhere(
      org.apache.spark.sql.SparkSession.active, path, filters.toSeq)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val version = Option(options.get("version")).map(_.toInt)
    // internal (maintenance) option: pin the scan to EXACTLY these shard
    // files — how compact/cluster read the committed set captured under
    // the metadata lock, so an in-flight concurrent writer's shard is
    // neither rewritten nor deleted by the swap
    val pinned = Option(options.get("shards"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    new DocStoreScanBuilder(path, schema, version, pinned)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    DocStore.validateSchema(info.schema())
    // queryId scopes this job's shards in their NAMES: task commits from a
    // failing job can race past the driver's message collection, so abort
    // cleans by name pattern, never by (possibly incomplete) messages.
    val compression = info.options().getOrDefault("compression", "none")
    val gzip = compression.toLowerCase match {
      case "gzip" => true
      case "none" | "uncompressed" => false
      case other => throw new IllegalArgumentException(
        s"docstore compression '$other' not supported; use gzip or none")
    }
    // Opt-in per-field bloom filters (`option("bloom.fields", "a,b")`):
    // equality/IN shard skipping on fields whose values scatter across
    // shards — the point lookup zone maps can never serve.
    val bloomFields = info.options().getOrDefault("bloom.fields", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknown = bloomFields.diff(info.schema().fieldNames.toSet)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"docstore bloom.fields name(s) not in schema: ${unknown.mkString(", ")}")
    new DocStoreWriteBuilder(path, info.schema(), info.queryId(), gzip, bloomFields)
  }
}

// ---------------------------------------------------------------------------
// Read path
// ---------------------------------------------------------------------------

private[docstore] class DocStoreScanBuilder(path: String, schema: StructType,
                                            version: Option[Int] = None,
                                            pinnedShards: Option[Set[String]] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggPushed: Option[Aggregation] = None

  /** Metadata-only aggregates: an ungrouped, unfiltered COUNT/COUNT(col)/
    * MIN/MAX is answered ENTIRELY from the committed zone maps — no shard
    * is opened (`collection.estimated_document_count()` economics, except
    * exact). Complete pushdown is offered only when every live shard has a
    * stats entry COVERING every referenced field (a shard written under a
    * narrower schema has no entry for a later field — declining beats a
    * wrong answer); any filter, limit, grouping, or other aggregate
    * declines and takes the normal scan path. The (stats, shard-list)
    * snapshot taken at push time is the one the scan executes against, so
    * a shard committed between planning and execution cannot be silently
    * half-counted.
    */
  private var aggSnapshot: Seq[DocStore.ShardStat] = Seq.empty

  override def supportCompletePushDown(agg: Aggregation): Boolean = canAnswerFromStats(agg)
  override def pushAggregation(agg: Aggregation): Boolean = canAnswerFromStats(agg) && {
    aggPushed = Some(agg)
    true
  }

  private def topField(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames().length == 1 &&
        schema.fieldNames.contains(nr.fieldNames()(0)) => Some(nr.fieldNames()(0))
      case _ => None
    }

  private def canAnswerFromStats(agg: Aggregation): Boolean = {
    // a snapshot read answers from its manifest's shards, not the live
    // set the stats snapshot covers — decline and take the scan path
    if (version.isDefined || pinnedShards.isDefined) return false
    if (pushed.nonEmpty || limit >= 0 || agg.groupByExpressions().nonEmpty) return false
    val referenced = Seq.newBuilder[String]
    val supportedFuncs = agg.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count => !c.isDistinct && topField(c.column()).exists { f => referenced += f; true }
      case m: Min => topField(m.column()).exists { f => referenced += f; true }
      case m: Max => topField(m.column()).exists { f => referenced += f; true }
      case _ => false
    }
    if (!supportedFuncs) return false
    val fields = referenced.result()
    // One (stats, shards) snapshot per builder: Spark calls
    // supportCompletePushDown then pushAggregation — re-reading would cost
    // a second remote listStatus+read AND could observe different state
    // than the snapshot the scan executes against.
    val covered = statsSnapshot
    val ok = covered.forall(_.exists(st => fields.forall(st.fields.contains)))
    if (ok) aggSnapshot = covered.flatten
    ok
  }

  private lazy val statsSnapshot: Seq[Option[DocStore.ShardStat]] = {
    val stats = DocStore.readStats(path, schema)
    DocStore.listParts(path).map(p => stats.get(p.getName)).toSeq
  }

  /** `find(...).limit(n)`: each shard reader stops consuming after n
    * surviving documents (post-filter). Partial push — Spark still applies
    * the global limit across partitions.
    */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  /** `find(filter)` support: accept the predicate shapes a document store
    * serves (equality, range, membership, existence, prefix) on top-level
    * fields; everything else stays a Spark-side residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(DocStoreFilters.supported(schema, _))
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = aggPushed match {
    case Some(agg) => new DocStoreAggScan(path, schema, agg, aggSnapshot)
    case None =>
      new DocStoreScan(path, schema, required, pushed, limit, version, pinnedShards)
  }
}

/** Scan for a completely-pushed aggregate: emits the ONE result row,
  * computed on the driver from the push-time zone-map snapshot — no shard
  * file is opened and no re-listing races with concurrent commits.
  */
private[docstore] class DocStoreAggScan(path: String, schema: StructType, agg: Aggregation,
                                        snapshot: Seq[DocStore.ShardStat])
    extends Scan with Batch {

  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames()(0)
  private def fieldType(n: String): DataType = schema(n).dataType

  override def readSchema(): StructType = StructType(agg.aggregateExpressions().zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (m: Min, i) => StructField(s"agg_$i", fieldType(fieldName(m.column())), nullable = true)
    case (m: Max, i) => StructField(s"agg_$i", fieldType(fieldName(m.column())), nullable = true)
    case (other, _) => throw new IllegalStateException(s"unreachable: $other")
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"docstore $path, PushedAggregates: [${agg.aggregateExpressions().mkString(", ")}] (stats-only, no shard read)"

  override def planInputPartitions(): Array[InputPartition] = {
    def internal(x: Any): Any = x match {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    val vals: Array[Any] = agg.aggregateExpressions().map {
      case _: CountStar => snapshot.map(_.count).sum
      case c: Count =>
        val f = fieldName(c.column()); snapshot.map(_.fields(f).nonNull).sum
      case m: Min =>
        val f = fieldName(m.column())
        internal(snapshot.flatMap(s => Option(s.fields(f).min))
          .reduceOption((a, b) => if (DocStore.cmpValues(a, b).exists(_ <= 0)) a else b).orNull)
      case m: Max =>
        val f = fieldName(m.column())
        internal(snapshot.flatMap(s => Option(s.fields(f).max))
          .reduceOption((a, b) => if (DocStore.cmpValues(a, b).exists(_ >= 0)) a else b).orNull)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    Array(DocStoreAggPartition(vals))
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private val vals = partition.asInstanceOf[DocStoreAggPartition].values
        private var done = false
        override def next(): Boolean = if (done) false else { done = true; true }
        override def get(): InternalRow = new GenericInternalRow(vals)
        override def close(): Unit = ()
      }
  }
}

private[docstore] case class DocStoreAggPartition(values: Array[Any]) extends InputPartition

private[docstore] class DocStoreScan(path: String, full: StructType,
                                     required: StructType, pushed: Array[Filter],
                                     limit: Int, version: Option[Int] = None,
                                     pinnedShards: Option[Set[String]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Shard planning with zone-map pruning: a shard is skipped when any
    * pushed (conjunctive) filter provably matches nothing in its
    * min/max/non-null stats — parquet row-group skipping, at shard
    * granularity. Shards without stats are always kept. A snapshot read
    * (`option("version", n)`) plans the MANIFEST's shard set instead of
    * the live listing — resolving maintenance-superseded shards out of
    * `_retired/` — and fails loudly if any snapshot shard has been
    * physically removed (overwrite reset or vacuum), never returning a
    * partial snapshot.
    */
  private lazy val planned: (Array[Path], Int) = {
    val all: Array[Path] = version match {
      case None if pinnedShards.isDefined =>
        val pin = pinnedShards.get
        val live = DocStore.listParts(path).filter(p => pin.contains(p.getName))
        val missing = pin.diff(live.map(_.getName).toSet)
        if (missing.nonEmpty) throw new IllegalStateException(
          s"docstore $path pinned shard(s) no longer present: ${missing.toSeq.sorted.mkString(", ")}")
        live
      case None => DocStore.listParts(path)
      case Some(v) =>
        val manifest = DocStore.readManifest(path, v)
        // resolve live first, then `_retired/` — a maintenance rewrite
        // moves superseded shards there so the versions referencing them
        // stay readable until an explicit vacuum reclaims the bytes
        val live = DocStore.listParts(path).map(p => p.getName -> p).toMap
        val retired = DocStore.listRetired(path).map(p => p.getName -> p).toMap
        val missing = manifest.filterNot(s => live.contains(s) || retired.contains(s))
        if (missing.nonEmpty) throw new IllegalStateException(
          s"docstore $path version $v is no longer readable: " +
            s"shard(s) ${missing.mkString(", ")} were removed by a later overwrite " +
            "(physical history reset) or reclaimed by vacuum")
        manifest.map(s => live.getOrElse(s, retired(s))).toArray
    }
    if (pushed.isEmpty) (all, all.length)
    else {
      val stats = DocStore.readStats(path, full)
      val kept = all.filter { p =>
        stats.get(p.getName).forall(st => pushed.forall(DocStore.shardMayMatch(_, st)))
      }
      (kept, all.length)
    }
  }

  override def description(): String =
    s"docstore $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadFields: [${required.fieldNames.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      version.fold("")(v => s", Version: $v") +
      s", Shards: ${planned._1.length}/${planned._2}"

  override def planInputPartitions(): Array[InputPartition] =
    planned._1.map(p => DocStorePartition(p.toString): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    // batch reads fail loudly on a shard deleted between planning and
    // read: silently dropping it returns a partial result (and a
    // version-pinned read explicitly PROMISES to fail rather than return
    // a half-snapshot). Only the streaming source tolerates missing files
    // (epoch replay legitimately replaces shards between offsets).
    new DocStoreReaderFactory(full, required, pushed, limit, tolerateMissing = false)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // A snapshot-pinned read cannot stream: offsets come from the LIVE
    // shard listing, so silently accepting `version` here would replay
    // arbitrary later data under a snapshot's name. Fail loudly (the
    // file's stale-snapshot rule) rather than dropping the option.
    version.foreach { v =>
      throw new UnsupportedOperationException(
        s"docstore $path: option(\"version\", $v) pins a batch snapshot and " +
          "cannot drive a streaming read — remove the option to stream the live collection")
    }
    pinnedShards.foreach { _ =>
      throw new UnsupportedOperationException(
        s"docstore $path: option(\"shards\", ...) pins a batch shard set and cannot drive a streaming read")
    }
    new DocStoreMicroBatchStream(path, full, required, pushed)
  }
}

/** Micro-batch streaming SOURCE over an append-only collection — the
  * change-stream analog: each trigger reads exactly the shards committed
  * since the last processed offset. An offset is the sorted set of shard
  * names already seen (the same discipline as Spark's file-stream source
  * log, carried in the offset itself — shard names are UUID-unique, so
  * set difference is exact). Pushed filters apply per micro-batch through
  * BOTH zone-map shard pruning and the in-reader document filter.
  *
  * Assumes append-only ingestion while the stream runs: overwrite or
  * compaction invalidates seen-shard offsets (like rewriting a Kafka
  * topic) — run those in maintenance windows. One sharper caveat: a
  * streaming SINK epoch replay (failure recovery) REPLACES its earlier
  * attempt's shards; a reader that already consumed the replaced shard
  * sees the replacement as new data — at-least-once across that window
  * (readers tolerate the deleted file and read the replacement whole),
  * exactly-once everywhere else.
  */
private[docstore] class DocStoreMicroBatchStream(path: String, full: StructType,
                                                 required: StructType, pushed: Array[Filter])
    extends MicroBatchStream {
  import com.fasterxml.jackson.databind.ObjectMapper

  private case class DocStoreOffset(shards: Seq[String]) extends Offset {
    override def json(): String = {
      val arr = JsonNodeFactory.instance.arrayNode()
      shards.foreach(arr.add)
      new ObjectMapper().writeValueAsString(arr)
    }
  }

  override def initialOffset(): Offset = DocStoreOffset(Seq.empty)
  override def latestOffset(): Offset =
    DocStoreOffset(DocStore.listParts(path).map(_.getName).toSeq)
  override def deserializeOffset(json: String): Offset = {
    val arr = new ObjectMapper().readTree(json)
    DocStoreOffset((0 until arr.size()).map(arr.get(_).asText()))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[DocStoreOffset].shards.toSet
    val fresh = end.asInstanceOf[DocStoreOffset].shards.filterNot(seen)
    val stats = if (pushed.isEmpty) Map.empty[String, DocStore.ShardStat]
      else DocStore.readStats(path, full)
    fresh
      .filter(n => stats.get(n).forall(st => pushed.forall(DocStore.shardMayMatch(_, st))))
      .map(n => DocStorePartition(new Path(path, n).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreReaderFactory(full, required, pushed, limit = -1, tolerateMissing = true)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[docstore] case class DocStorePartition(file: String) extends InputPartition

private[docstore] class DocStoreReaderFactory(full: StructType, required: StructType,
                                              pushed: Array[Filter], limit: Int,
                                              tolerateMissing: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DocStoreReader(partition.asInstanceOf[DocStorePartition].file, full, required,
      pushed, limit, tolerateMissing)
}

/** Streams one shard: parse each line's document, evaluate pushed filters on
  * the document (absent field = null, exactly `find`'s missing-field
  * semantics), then materialize only the required fields.
  */
private[docstore] class DocStoreReader(file: String, full: StructType,
                                       required: StructType, pushed: Array[Filter],
                                       limit: Int, tolerateMissing: Boolean)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val p = new Path(file)
  private var in: java.io.InputStream = _
  // Lazy; missing-file tolerance is the STREAMING source's contract only
  // (a sink epoch replay can delete a shard between offset capture and
  // read — the replacement arrives as a later offset). Batch scans
  // rethrow: silently dropping a shard returns a partial result, and the
  // version-pinned read documents the opposite.
  private lazy val lines: Iterator[String] =
    try {
      // assign `in` BEFORE the gzip wrap: the GZIPInputStream constructor
      // eagerly reads the header and can throw on a corrupt shard — `in`
      // must already hold the raw stream so close() releases the fd. The
      // OUTERMOST stream then replaces it: a GZIPInputStream holds a
      // native Inflater that only end()s on close.
      in = DocStore.fs(p).open(p)
      if (file.endsWith(".gz")) in = new java.util.zip.GZIPInputStream(in)
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
    } catch {
      case e: java.io.FileNotFoundException =>
        if (tolerateMissing) Iterator.empty
        else throw new java.io.FileNotFoundException(
          s"docstore shard vanished between planning and read: $file — " +
            "a concurrent overwrite/compaction raced this scan (maintenance " +
            s"belongs in a writer-free window); original: ${e.getMessage}")
    }
  private val fullIdx: Map[String, StructField] = full.fields.map(f => f.name -> f).toMap
  private val matches: JsonNode => Boolean = DocStoreFilters.compile(pushed, fullIdx)
  private var current: InternalRow = _
  private var emitted = 0L

  // Torn-shard containment: a truncated gzip member throws EOF/Zip
  // exceptions from the line ITERATOR mid-stream, and a torn plain shard
  // leaves a half-written final JSON line — both must surface as one
  // loud error naming the shard and the diagnosis, not as a bare codec
  // stack trace from some task (and never as silently fewer rows).
  private def torn(cause: Exception): Nothing =
    throw new IllegalStateException(
      s"docstore shard $file is corrupt or torn (${cause.getClass.getSimpleName}: " +
        s"${cause.getMessage}) after $emitted matched document(s) — a partial " +
        "write or storage corruption. Restore the shard, or compact the " +
        "collection from a backup in a writer-free window.", cause)

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    // FileNotFound passes through untouched: the lazy initializer already
    // raises it with the vanished-shard diagnosis (or tolerates it for
    // the streaming source) — wrapping it as "torn" would misdiagnose
    while (try lines.hasNext
           catch {
             case e: java.io.FileNotFoundException => throw e
             case e: java.io.IOException => torn(e)
           }) {
      val line = try lines.next()
                 catch {
                   case e: java.io.FileNotFoundException => throw e
                   case e: java.io.IOException => torn(e)
                 }
      if (line.nonEmpty) {
        val doc = try mapper.readTree(line)
                  catch { case e: com.fasterxml.jackson.core.JacksonException => torn(e) }
        if (doc == null) torn(new java.io.IOException("empty JSON document line"))
        if (matches(doc)) {
          val vals = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            val fld = required.fields(i)
            vals(i) = DocStoreFilters.fieldValue(doc.get(fld.name), fld.dataType)
            i += 1
          }
          current = new GenericInternalRow(vals)
          emitted += 1
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = if (in != null) in.close()
}

/** Filter support/evaluation shared by planner (supported) and reader
  * (eval). Evaluation happens on the raw document node, pre-materialization.
  */
private[docstore] object DocStoreFilters {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => top(schema, a)
    case GreaterThan(a, _) => top(schema, a)
    case GreaterThanOrEqual(a, _) => top(schema, a)
    case LessThan(a, _) => top(schema, a)
    case LessThanOrEqual(a, _) => top(schema, a)
    case In(a, _) => top(schema, a)
    case IsNull(a) => top(schema, a)
    case IsNotNull(a) => top(schema, a)
    case StringStartsWith(a, _) => top(schema, a)
    // SQL `DELETE FROM t` with no WHERE arrives as AlwaysTrue — the
    // trivially supportable unconditional case (canDeleteWhere rejected
    // it before this arm existed)
    case _: org.apache.spark.sql.sources.AlwaysTrue => true
    case _: org.apache.spark.sql.sources.AlwaysFalse => true
    case _ => false
  }
  private def top(schema: StructType, attr: String): Boolean =
    !attr.contains(".") && schema.fieldNames.contains(attr)

  /** Spark-internal value (UTF8String for strings) for a JSON node, or null
    * when the field is absent or JSON-null.
    */
  def fieldValue(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case StringType => UTF8String.fromString(node.asText())
      case IntegerType => node.asInt()
      case LongType => node.asLong()
      case DoubleType => node.asDouble()
      case BooleanType => node.asBoolean()
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  /** External (JVM) value for comparison against Filter literals. */
  private def external(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case StringType => node.asText()
      case IntegerType => node.asInt()
      case LongType => node.asLong()
      case DoubleType => node.asDouble()
      case BooleanType => node.asBoolean()
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  // The single shared order: evaluation MUST use the same comparison the
  // zone-map pruning uses, or a pruned shard could contain a matching doc.
  private def cmp(x: Any, v: Any): Option[Int] = DocStore.cmpValues(x, v)

  /** Precompiled conjunction of pushed filters — semantics identical to
    * `fs.forall(eval(_, doc, schema))`, hoisted out of per-document loops.
    * The one specialization: an `In` over a LARGE homogeneous value list
    * (a bulk upsert pushes its whole key set — tens of thousands of keys)
    * evaluates as one hash probe per document instead of a linear scan of
    * the value array, which turns the shard rewrite from
    * O(docs·keys) into O(docs). The probe fires only when the extracted
    * value has exactly the values' runtime class; any cross-box case
    * (int column vs long literals, integral vs floating, ±0.0) falls back
    * to the ordered cmp path the zone maps also use.
    */
  def compile(fs: Seq[Filter], schema: Map[String, StructField]): JsonNode => Boolean = {
    // -0.0 ⇄ 0.0 canonicalization: the SAME rule lives in Bloom.hashPair,
    // cmpValues' norm, and upsert's canonKey (which adds integral
    // widening) — filter eval, stats, blooms, and prune decisions must
    // share ONE equality; editing any copy without the others produces
    // unsound pruning. (Kept as per-site code rather than one helper
    // because the sites canonicalize at different type scopes; the
    // cross-reference is the drift tripwire.)
    def normZero(v: Any): Any = v match {
      case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
      case x => x
    }
    val fns: Seq[JsonNode => Boolean] = fs.map {
      case f @ In(a, vs) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.length >= 8 && nonNull.forall(_.getClass == nonNull.head.getClass)) {
          val cls: Class[_] = nonNull.head.getClass
          val set = nonNull.iterator.map(normZero).toSet
          doc => {
            val x = ext(doc, a, schema)
            x != null && (if (x.getClass == cls) set.contains(normZero(x))
                          else vs.exists(v => cmp(x, v).contains(0)))
          }
        } else { doc => eval(f, doc, schema) }
      case f => doc => eval(f, doc, schema)
    }
    doc => fns.forall(_(doc))
  }

  def eval(f: Filter, doc: JsonNode, schema: Map[String, StructField]): Boolean = f match {
    case EqualTo(a, v) => cmp(ext(doc, a, schema), v).contains(0)
    case GreaterThan(a, v) => cmp(ext(doc, a, schema), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(ext(doc, a, schema), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(ext(doc, a, schema), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(ext(doc, a, schema), v).exists(_ <= 0)
    case In(a, vs) => { val x = ext(doc, a, schema); x != null && vs.exists(v => cmp(x, v).contains(0)) }
    case IsNull(a) => ext(doc, a, schema) == null
    case IsNotNull(a) => ext(doc, a, schema) != null
    case StringStartsWith(a, v) => ext(doc, a, schema) match {
      case s: String => s.startsWith(v)
      case _ => false
    }
    case _: org.apache.spark.sql.sources.AlwaysTrue => true
    case _: org.apache.spark.sql.sources.AlwaysFalse => false
    case other => throw new IllegalStateException(s"unsupported pushed filter: $other")
  }
  private def ext(doc: JsonNode, attr: String, schema: Map[String, StructField]): Any =
    external(doc.get(attr), schema(attr).dataType)
}

// ---------------------------------------------------------------------------
// Write path
// ---------------------------------------------------------------------------

private[docstore] class DocStoreWriteBuilder(path: String, schema: StructType, queryId: String,
                                             gzip: Boolean, bloomFields: Set[String])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new DocStoreWrite(path, schema, doTruncate, queryId, gzip, bloomFields)
}

private[docstore] class DocStoreWrite(path: String, schema: StructType, truncate: Boolean,
                                      queryId: String, gzip: Boolean, bloomFields: Set[String])
    extends Write {
  override def toBatch: BatchWrite =
    new DocStoreBatchWrite(path, schema, truncate, queryId, gzip, bloomFields)
  override def toStreaming: StreamingWrite = {
    // Complete/update modes would need per-epoch truncation; the document
    // store is an append-only collection (insert_many), so only Append.
    if (truncate) throw new UnsupportedOperationException(
      "docstore streaming sink supports Append output mode only")
    new DocStoreStreamingWrite(path, schema, queryId, gzip, bloomFields)
  }
}

/** Streaming sink: each micro-batch epoch appends its own set of shards,
  * tagged `part-e<epoch>-q<queryTag>-…`. Epoch commit is IDEMPOTENT: it
  * deletes any same-epoch shards OF THIS QUERY not in the committing
  * attempt (leftovers of a failed or replayed attempt), so a replayed
  * epoch REPLACES its earlier files instead of duplicating them —
  * effective exactly-once into the collection, same discipline as a
  * file-sink metadata log but enforced with the shard-name tags. The
  * query tag is the fencing the batch path already has (`part-q<tag>-`):
  * without it, two streaming queries appending to one collection would
  * delete each other's committed shards whenever their epoch counters
  * collide.
  *
  * Compatibility note: shards written by the pre-query-tag sink naming
  * (`part-e<epoch>-<pid>-…`, rounds ≤7) are NOT matched by this cleanup —
  * an in-flight epoch from before the rename that replays after an
  * upgrade would leave its old-name shards behind as duplicates. This
  * repo has no such collections (every docstore dir is driver-rebuilt per
  * round); a production migration would either drain queries before
  * upgrading or extend the filter to the legacy prefix scoped to this
  * query's checkpoint.
  */
private[docstore] class DocStoreStreamingWrite(path: String, schema: StructType, queryId: String,
                                               gzip: Boolean, bloomFields: Set[String])
    extends StreamingWrite {
  private val queryTag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(12)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    // fail a retyped append BEFORE any shard is staged (the commit-time
    // merge would throw only after data landed)
    DocStore.mergedSchemaFor(path, schema)
    new DocStoreStreamingWriterFactory(path, schema, queryTag, gzip, bloomFields)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect { case DocStoreCommit(Some(file), _) => new Path(file).getName }.toSet
    val f = DocStore.fs(new Path(path))
    DocStore.listParts(path)
      .filter(p => p.getName.startsWith(s"part-e$epochId-q$queryTag-") && !committed.contains(p.getName))
      .foreach(p => f.delete(p, false))
    // Metadata phase under the JVM lock: two queries committing the same
    // instant would otherwise lose each other's stats/schema entries
    // (read-modify-write) — see DocStore.metadataLock.
    DocStore.metadataLock.synchronized {
      // Merge AFTER the replay cleanup so stale same-epoch entries drop out.
      DocStore.writeStats(path, DocStoreCommitOps.mergedStats(path, messages))
      // Every epoch is a snapshot. A REPLAYED epoch replaces its earlier
      // attempt's shards, so the pre-replay version referencing them reads
      // as missing-shard — loud, per the at-least-once caveat above.
      DocStore.writeManifest(path, reset = false)
      // union-merge, never replace: the sink only appends, and two queries
      // sharing one collection must not flip-flop the schema every epoch
      DocStore.mergeStoredSchema(path, schema)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // Clean by the epoch+query name prefix, NOT by messages — a task that
    // committed its rename just before the epoch failed may be missing
    // from `messages` (the batch abort's own rationale) and would survive
    // as live phantom data from a never-committed epoch. But KEEP any
    // prefix-matching shard recorded in _stats.json OR in the latest
    // version manifest: those belong to a PREVIOUS successful commit of
    // this epoch (an at-least-once replay) that this failed attempt must
    // not destroy; this attempt's strays are in neither (both merge only
    // at commit). The manifest check is belt on top of stats — version
    // files are append-only, so a committed shard's manifest entry can
    // never be lost the way a racing stats write could lose one.
    DocStore.metadataLock.synchronized {
      val f = DocStore.fs(new Path(path))
      val inStats = DocStore.readStats(path).keySet
      val inManifest = DocStore.listVersions(path).lastOption
        .map(v => DocStore.readManifest(path, v).toSet).getOrElse(Set.empty[String])
      val committed = inStats ++ inManifest
      DocStore.listParts(path)
        .filter(p => p.getName.startsWith(s"part-e$epochId-q$queryTag-") &&
          !committed.contains(p.getName))
        .foreach(p => f.delete(p, false))
    }
  }
}

private[docstore] class DocStoreStreamingWriterFactory(path: String, schema: StructType,
                                                       queryTag: String,
                                                       gzip: Boolean, bloomFields: Set[String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DocStoreWriter(path, schema, partitionId, taskId, Some(epochId),
      jobTag = Some(queryTag), gzip = gzip, bloomFields = bloomFields)
}

private[docstore] class DocStoreBatchWrite(path: String, schema: StructType, truncate: Boolean,
                                           queryId: String, gzip: Boolean, bloomFields: Set[String])
    extends BatchWrite {
  // short, filename-safe job tag (queryId is a UUID)
  private val jobTag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(12)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val f = DocStore.fs(dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    // fail a retyped append BEFORE any shard is staged (the commit-time
    // merge would throw only after data landed); overwrite replaces the
    // schema, so any retype is legitimate there
    if (!truncate) DocStore.mergedSchemaFor(path, schema)
    new DocStoreWriterFactory(path, schema, jobTag, gzip, bloomFields)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // Shards were renamed into place by task commit. Overwrite deletes the
    // PREVIOUS shards only now, at job commit — a failed or aborted
    // overwrite therefore leaves the old collection fully intact (UUID
    // shard names make old and new coexist safely until this point).
    if (truncate) {
      val f = DocStore.fs(new Path(path))
      DocStore.listParts(path).filterNot(_.getName.startsWith(s"part-q$jobTag-"))
        .foreach(p => f.delete(p, false))
      // overwrite is the one PHYSICAL history reset (it may retype the
      // schema, and old documents read through a new schema would be
      // corruption): the manifest log resets to v1 below, so retired
      // shards — referenced only by the discarded log — go with it
      val rd = new Path(new Path(path), DocStore.RetiredDir)
      if (f.exists(rd)) f.delete(rd, true)
    }
    // Zone maps: keep prior stats only for shards that still exist, add
    // this write's entries, publish stats, then the version manifest
    // (append = next snapshot; overwrite = history reset to v1), then
    // schema last so a concurrent reader never sees a schema without
    // data. Under the JVM metadata lock: a same-instant commit by another
    // query would otherwise lose this one's stats/schema entries
    // (read-modify-write) — see DocStore.metadataLock.
    DocStore.metadataLock.synchronized {
      DocStore.writeStats(path, DocStoreCommitOps.mergedStats(path, messages))
      DocStore.writeManifest(path, reset = truncate)
      // overwrite REPLACES the schema (the collection is new data); append
      // union-merges it so a narrower append can't hide stored fields
      if (truncate) DocStore.writeStoredSchema(path, schema)
      else DocStore.mergeStoredSchema(path, schema)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Clean by job tag, NOT by messages: a task that committed its rename
    // just before the job failed may not have its message in `messages`.
    val f = DocStore.fs(new Path(path))
    DocStore.listParts(path).filter(_.getName.startsWith(s"part-q$jobTag-"))
      .foreach(p => f.delete(p, false))
  }
}

private[docstore] object DocStoreCommitOps {
  /** Previous stats restricted to shards still on disk, plus the committed
    * messages' fresh entries.
    */
  def mergedStats(path: String, messages: Array[WriterCommitMessage]): Map[String, DocStore.ShardStat] = {
    val live = DocStore.listParts(path).map(_.getName).toSet
    val prior = DocStore.readStats(path).filter { case (shard, _) => live.contains(shard) }
    val fresh = messages.collect {
      case DocStoreCommit(Some(file), Some(stat)) => new Path(file).getName -> stat
    }.toMap
    prior ++ fresh
  }
}

private[docstore] case class DocStoreCommit(file: Option[String],
                                            stat: Option[DocStore.ShardStat])
    extends WriterCommitMessage

private[docstore] class DocStoreWriterFactory(path: String, schema: StructType, jobTag: String,
                                              gzip: Boolean, bloomFields: Set[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocStoreWriter(path, schema, partitionId, taskId, epoch = None,
      jobTag = Some(jobTag), gzip = gzip, bloomFields = bloomFields)
}

/** One task = one shard. Rows stream to a hidden temp file; task commit
  * renames it to its final `part-...jsonl` name (atomic on HDFS, and never
  * visible to `listParts` before commit because temp names don't match the
  * shard pattern). Null fields are OMITTED from the document — document
  * stores don't write explicit nulls, and absent reads back as null.
  */
private[docstore] class DocStoreWriter(dir: String, schema: StructType,
                                       partitionId: Int, taskId: Long,
                                       epoch: Option[Long] = None,
                                       jobTag: Option[String] = None,
                                       gzip: Boolean = false,
                                       bloomFields: Set[String] = Set.empty)
    extends DataWriter[InternalRow] {
  private val uuid = UUID.randomUUID().toString
  private val tmp = new Path(dir, s".tmp-$partitionId-$taskId-$uuid")
  // Streaming shards carry their epoch tag (the idempotent-replay key);
  // batch shards use the plain numeric form, which can never collide with
  // the `part-e…` pattern.
  private val ext = if (gzip) ".jsonl.gz" else ".jsonl"
  private val fin = new Path(dir, epoch match {
    case Some(e) => s"part-e$e-q${jobTag.getOrElse("x")}-$partitionId-$taskId-$uuid$ext"
    case None => s"part-q${jobTag.getOrElse("x")}-$partitionId-$taskId-$uuid$ext"
  })
  private var out: java.io.BufferedWriter = _
  // Streaming JsonGenerator over `out` (r17): the ObjectNode +
  // writeValueAsString form built a tree and an intermediate String per
  // document; the generator writes the SAME bytes (Jackson's serializer
  // for ObjectNode is this generator API — same escaping, same number
  // rendering, fields in the same schema order, '\n' after every doc)
  // straight into the shard stream.
  private var gen: com.fasterxml.jackson.core.JsonGenerator = _
  private var wrote = false
  // zone-map accumulators, one slot per field
  private val mins = new Array[Any](schema.length)
  private val maxs = new Array[Any](schema.length)
  private val nonNull = new Array[Long](schema.length)
  private var rows = 0L
  // bloom hash-pair buffers for tracked fields (the filter itself is built
  // at commit, once the value count — and so the right m — is known)
  private val bloomBufs: Array[Array[Long]] = new Array(schema.length)
  private val bloomLens: Array[Int] = new Array[Int](schema.length)
  private val bloomTracked: Array[Boolean] =
    schema.fields.map(f => bloomFields.contains(f.name))

  // past SaturationCount values the filter is max-size no matter what, so
  // the buffer freezes into the built filter and later pairs insert
  // directly — bounding writer heap at ~8B×SaturationCount per field
  // instead of 8B×rows
  private val bloomSat: Array[DocStore.Bloom] = new Array(schema.length)

  private def bloomAdd(i: Int, pair: Long): Unit = {
    if (bloomSat(i) != null) { DocStore.Bloom.insert(bloomSat(i), pair); return }
    var buf = bloomBufs(i)
    if (buf == null) { buf = new Array[Long](1024); bloomBufs(i) = buf }
    else if (bloomLens(i) == buf.length) {
      buf = java.util.Arrays.copyOf(buf, buf.length * 2); bloomBufs(i) = buf
    }
    buf(bloomLens(i)) = pair
    bloomLens(i) += 1
    if (bloomLens(i) >= DocStore.Bloom.SaturationCount) {
      bloomSat(i) = DocStore.Bloom.build(bloomBufs(i), bloomLens(i))
      bloomBufs(i) = null
    }
  }

  private def ensureOpen(): Unit = if (out == null) {
    val f = DocStore.fs(tmp)
    val raw: java.io.OutputStream = f.create(tmp, true)
    val stream = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
    out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(stream, "UTF-8"))
    gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(out)
    // root-value separator off: the explicit writeRaw('\n') after each
    // document IS the separator (and the trailing newline), byte-equal to
    // the previous per-line form
    gen.setRootValueSeparator(null)
  }

  // closing the generator flushes it and closes `out` (AUTO_CLOSE_TARGET)
  private def closeOut(): Unit = if (gen != null) gen.close() else if (out != null) out.close()

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    gen.writeStartObject()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val fld = schema.fields(i)
        val ext: Any = fld.dataType match {
          case StringType => val s = row.getUTF8String(i).toString; gen.writeStringField(fld.name, s); s
          case IntegerType => val v = row.getInt(i); gen.writeNumberField(fld.name, v); v
          case LongType => val v = row.getLong(i); gen.writeNumberField(fld.name, v); v
          case DoubleType => val v = row.getDouble(i); gen.writeNumberField(fld.name, v); v
          case BooleanType => val v = row.getBoolean(i); gen.writeBooleanField(fld.name, v); v
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        if (nonNull(i) == 0 || DocStore.cmpValues(ext, mins(i)).exists(_ < 0)) mins(i) = ext
        if (nonNull(i) == 0 || DocStore.cmpValues(ext, maxs(i)).exists(_ > 0)) maxs(i) = ext
        nonNull(i) += 1
        if (bloomTracked(i))
          DocStore.Bloom.hashPair(ext).foreach(bloomAdd(i, _))
      }
      i += 1
    }
    rows += 1
    gen.writeEndObject()
    gen.writeRaw('\n')
    wrote = true
  }

  private def shardStat: DocStore.ShardStat = DocStore.ShardStat(rows,
    schema.fields.zipWithIndex.map { case (fld, i) =>
      val bloom = if (bloomSat(i) != null) Some(bloomSat(i))
        else if (bloomTracked(i) && bloomLens(i) > 0)
          Some(DocStore.Bloom.build(bloomBufs(i), bloomLens(i)))
        else None
      fld.name -> DocStore.FieldStat(mins(i), maxs(i), nonNull(i), bloom)
    }.toMap)

  override def commit(): WriterCommitMessage = {
    closeOut()
    if (wrote) {
      // Hadoop FileSystem signals rename failure by RETURNING false — an
      // unchecked rename would report a committed shard that doesn't exist.
      if (!DocStore.fs(tmp).rename(tmp, fin))
        throw new java.io.IOException(s"docstore: failed to commit shard $tmp -> $fin")
      DocStoreCommit(Some(fin.toString), Some(shardStat))
    } else {
      if (out != null) DocStore.fs(tmp).delete(tmp, false)
      DocStoreCommit(None, None)   // empty partition: no shard file
    }
  }

  override def abort(): Unit = {
    if (out != null) { closeOut(); DocStore.fs(tmp).delete(tmp, false) }
  }
  override def close(): Unit = ()
}
