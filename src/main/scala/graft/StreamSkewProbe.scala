package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-side skew measurement (r15 — the batch [[SkewProbe]] covers
  * joins/windows/aggregates; the stateful streaming path has the same
  * hot-key risk and had no numbers). Feeds the seeded hot-key corpus
  * (`make_scale10.py --hot-user=0.3`, one user owning ~30% of events)
  * through the two `flatMapGroupsWithState` twins with the heaviest
  * per-key folds — `Funnel.conversionStream` and
  * `StreamingAnalytics.scd2Stream` — as REAL streaming queries across
  * micro-batches, and measures:
  *
  *  1. Per-task spread of the stateful stage (shuffle-read bytes +
  *     duration): a keyed fold's partitioning is required state
  *     partitioning, so the hot key's group is ONE task that no
  *     optimizer can split — the streaming sibling of SkewProbe's
  *     window ceiling, quantified here so the registry's "bounded
  *     per-key state, skew is wall-clock not memory" claim is measured,
  *     not asserted. (At 100 TB the mitigation is key-space design —
  *     these operators key on users/entities, never on a boolean-like
  *     low-cardinality column — plus the batch twins for backfill.)
  *  2. The BOUNDED-STATE contract under the hot key: state rows track
  *     ACTIVE KEYS, not events — the hot key contributes one state
  *     record despite owning 30% of the stream — read from the state
  *     store's own metrics (`stateOperators.numRowsTotal`), with the
  *     per-row byte cost printed.
  *
  * Prints PASS/FAIL per assertion; exits 1 on any FAIL.
  * Usage: runMain graft.StreamSkewProbe [skewCorpusDir]
  *        (default /tmp/graft_skew10 — build with tools/skew_gate.sh)
  */
object StreamSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_skew10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFileSystem") // no-fork chmod: see FastLocalFileSystem
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val meter = new SkewMeter(spark)
    def spread(): SkewMeter.Spread = meter.spread()
    def fmt(s: SkewMeter.Spread) = SkewMeter.fmt(s)

    var failures = 0
    def check(name: String, ok: Boolean, detail: String): Unit = {
      println(f"${if (ok) "PASS" else "FAIL"}  $name%-52s $detail")
      if (!ok) failures += 1
    }

    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
    val total = ev.count()
    val hotShare = ev.filter(col("user_id") === 0L).count().toDouble / total
    val distinctUsers = ev.select("user_id").distinct().count()
    println(f"corpus: $dir, hot user owns ${hotShare * 100}%.1f%% of $total%d events, $distinctUsers%d distinct users")

    // ---- 1. conversionStream: funnel fold on the hot key ----------------
    // fed in event-time order (3 chunks) so the 1-hour watermark never
    // drops rows for a reason unrelated to skew
    locally {
      val rows: Seq[(Long, Timestamp, String)] = ev
        .select(col("user_id"), col("ts"), col("event_type"))
        .orderBy("ts", "user_id").as[(Long, Timestamp, String)].collect().toSeq
      val mem = MemoryStream[(Long, Timestamp, String)]
      val out = graft.operators.Funnel.conversionStream(
        mem.toDS(), Seq("click", "purchase"), windowMillis = 7L * 24 * 3600 * 1000)
      meter.clear()
      val q = out.writeStream.format("memory").queryName("skew_funnel")
        .outputMode("append").start()
      rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      val stateOps = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      q.stop()
      val s = spread()
      val conversions = spark.table("skew_funnel").count()
      val stateRows = stateOps.map(_.numRowsTotal).sum
      val stateBytes = stateOps.map(_.memoryUsedBytes).sum
      println(s"  conversionStream stateful stage: ${fmt(s)}")
      println(f"  conversionStream state: $stateRows%d rows, ${stateBytes / 1e6}%.2f MB (${conversions}%d conversions emitted)")
      check("funnel fold concentrates the hot key (1 task, unsplittable)",
        s.maxOverMedian > 5,
        f"hot task reads ${s.maxOverMedian}%.1fx the median — per-key folds cannot be split, the streaming window-ceiling sibling")
      check("funnel state tracks KEYS, not the hot key's events",
        stateRows > 0 && stateRows <= distinctUsers,
        f"$stateRows%d state rows vs $distinctUsers%d users vs ${(hotShare * total).toLong}%d hot-key events — the hot key holds ONE record")
    }

    // ---- 2. scd2Stream: open-run fold on the hot key --------------------
    locally {
      val rows: Seq[(Long, Long, Timestamp, String)] = ev
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .orderBy("event_id").as[(Long, Long, Timestamp, String)].collect().toSeq
      val mem = MemoryStream[(Long, Long, Timestamp, String)]
      val out = graft.streaming.StreamingAnalytics.scd2Stream(mem.toDS())
      meter.clear()
      val q = out.writeStream.format("memory").queryName("skew_scd2")
        .outputMode("append").start()
      rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      val stateOps = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      q.stop()
      val s = spread()
      val versions = spark.table("skew_scd2").count()
      val stateRows = stateOps.map(_.numRowsTotal).sum
      val stateBytes = stateOps.map(_.memoryUsedBytes).sum
      println(s"  scd2Stream stateful stage: ${fmt(s)}")
      println(f"  scd2Stream state: $stateRows%d rows, ${stateBytes / 1e6}%.2f MB (${versions}%d closed versions emitted)")
      check("scd2 fold concentrates the hot key (1 task, unsplittable)",
        s.maxOverMedian > 5,
        f"hot task reads ${s.maxOverMedian}%.1fx the median")
      check("scd2 state is exactly one open run per key (NoTimeout)",
        stateRows == distinctUsers,
        f"$stateRows%d state rows vs $distinctUsers%d users — the hot key's 30%% of events collapse to one open-run record")
    }

    spark.stop()
    println(if (failures == 0) "STREAMSKEW OK" else s"STREAMSKEW $failures FAILURES")
    if (failures > 0) sys.exit(1)
  }
}
