package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import graft.sources.docstore.DocStoreMaintenance

/** Multi-writer concurrency over ONE docstore collection, exercising the
  * documented contract end-to-end rather than arguing from the lock's
  * scaladoc:
  *
  *   - CONCURRENT COMMITS (supported, serialized by `DocStore
  *     .metadataLock`): several appenders race freely, two of them
  *     carrying a column the others don't (schema union-merge must
  *     survive same-instant commits — a lost `_schema.json` entry is
  *     physically destructive at the next compact, and a lost
  *     `_stats.json` entry silently unprunes a shard).
  *   - MAINTENANCE (single-maintenance-writer contract): upserts and
  *     compactions run concurrently WITH the appenders but serialize
  *     among THEMSELVES on a per-collection lock — exactly the rule the
  *     scaladoc prescribes in place of a lock service.
  *
  * Afterwards every committed row must be readable with its final value
  * (no lost updates), the stats-pushdown count must agree with the data
  * read, the stored schema must hold the union of every writer's fields,
  * and the version-manifest retry must have stayed bounded (a livelock
  * throws loudly inside a writer and fails the test through `errors`).
  */
class DocStoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("racing appends + serialized upserts/compaction lose no rows, stats, or schema fields") {
    val dir = Files.createTempDirectory("graft_docstore_mw").toString
    // seed: keys 0..99 owned by the upserters (appenders never touch them)
    (0L until 100L).map(i => (i, 0L)).toDF("doc_id", "v")
      .coalesce(2).write.format("docstore").mode("append").save(dir)

    val maintenanceLock = new Object
    val pool = Executors.newFixedThreadPool(7)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit): Callable[Unit] = () =>
      try body catch { case t: Throwable => errors.add(t) }

    // 4 appenders × 4 commits × 25 docs, disjoint id ranges ≥ 1000;
    // appenders 0 and 1 also write `tag` (schema evolution under race)
    val appenders = (0 until 4).map { t =>
      task {
        (0 until 4).foreach { b =>
          val ids = (0 until 25).map(i => 1000L + t * 1000L + b * 25L + i)
          val df =
            if (t <= 1) ids.map(id => (id, id * 2, s"t$t")).toDF("doc_id", "v", "tag")
            else ids.map(id => (id, id * 2)).toDF("doc_id", "v")
          df.coalesce(1).write.format("docstore").mode("append").save(dir)
        }
      }
    }
    // 2 upserters, disjoint key halves of the seed, 3 stamped rounds each
    val upserters = (0 until 2).map { u =>
      task {
        (1 to 3).foreach { round =>
          val batch = (0L until 50L).map(i => (u * 50L + i, round * 10L + u))
            .toDF("doc_id", "v")
          maintenanceLock.synchronized {
            DocStoreMaintenance.upsert(spark, dir, "doc_id", batch)
          }
        }
      }
    }
    val compactor = task {
      (1 to 2).foreach { _ =>
        maintenanceLock.synchronized {
          DocStoreMaintenance.compact(spark, dir, targetShards = 3)
        }
        Thread.sleep(50)
      }
    }
    (appenders ++ upserters :+ compactor).foreach(c => pool.submit(c))
    pool.shutdown()
    assert(pool.awaitTermination(5, TimeUnit.MINUTES), "writer threads hung")
    assert(errors.isEmpty, s"writer failures: ${errors.toArray.mkString("; ")}")

    val rows = spark.read.format("docstore").load(dir)
      .select("doc_id", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no lost appends, each exactly once (the Map above would mask a
    // duplicate id — check the raw count too)
    assert(spark.read.format("docstore").load(dir).count() == 500L)
    assert(rows.size == 500, s"expected 500 distinct docs, got ${rows.size}")
    (0 until 4).foreach { t =>
      (0 until 100).foreach { i =>
        val id = 1000L + t * 1000L + i
        assert(rows.get(id).contains(id * 2), s"appended doc $id lost or corrupted")
      }
    }
    // no lost updates: each upserted key holds its owner's FINAL stamp
    (0L until 100L).foreach { k =>
      val owner = if (k < 50) 0L else 1L
      assert(rows.get(k).contains(30L + owner), s"key $k: ${rows.get(k)} != ${30 + owner}")
    }
    // stats survived every race: the pushdown count path must agree
    assert(spark.read.format("docstore").load(dir)
      .groupBy().count().head().getLong(0) == 500L)
    // schema union-merge survived: the tag column is live with its values
    val tags = spark.read.format("docstore").load(dir)
      .filter(col("tag").isNotNull).groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags == Map("t0" -> 100L, "t1" -> 100L), s"schema/tag drift: $tags")
    // version log is live and its LATEST manifest reads back the full
    // final state (the connector validates every manifest-listed shard
    // exists — a drifted manifest fails loudly here)
    val commits = new java.io.File(s"$dir/_commits").listFiles()
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json")).sorted
    assert(commits.nonEmpty, "version log empty after the race")
    val latestV = commits.last.stripPrefix("v").stripSuffix(".json").toInt
    assert(spark.read.format("docstore").option("version", latestV.toString)
      .load(dir).count() == 500L, s"latest manifest v$latestV is not the final state")
  }
}
