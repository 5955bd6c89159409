package graft

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming exact dedup: duplicates within the watermark window are
  * dropped, distinct texts pass through, and the dedup key is the content
  * hash (bounded 8-byte state), not the text.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("duplicates within the watermark are dropped; output equals batch distinct-by-text") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val rows = Seq(
      (1L, t(0), "alpha doc"), (2L, t(1), "beta doc"),
      (3L, t(2), "alpha doc"), // dup of 1 within watermark → dropped
      (4L, t(3), "gamma doc"),
      (5L, t(4), "beta doc"))  // dup of 2 → dropped
    mem.addData(rows)

    val out = StreamingAnalytics.dedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "text", "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L)) // first copy of each distinct text
    assert(got.size == rows.map(_._3).distinct.size)
  }

  test("cleanCorpusStream ≡ batch gates over the deduped stream") {
    implicit val sq = spark.sqlContext
    // distinct-word-heavy so only the INTENDED gate trips each doc
    val good = (1 to 40).flatMap(i => Seq("the", s"word$i")).mkString(" ")
    val spanish = (1 to 40).flatMap(i => Seq("el", s"palabra$i")).mkString(" ")
    val repetitive = ("spam " * 120).trim
    val junk = "zzzz"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val rows = Seq(
      (1L, t(0), good),
      (2L, t(1), spanish),    // lang gate drops
      (3L, t(2), repetitive), // repetition gate drops
      (4L, t(3), junk),       // quality gate drops
      (5L, t(4), good),       // dup of 1 → dedup drops
      (6L, t(5), good + " extra tail words here")) // distinct, passes
    mem.addData(rows)

    val out = graft.streaming.StreamingAnalytics.cleanCorpusStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "30 minutes")
    val q = out.writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("clean_stream")
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // batch parity: first-copy-per-text through the SAME shared gates
    val firstCopies = rows.groupBy(_._3).map(_._2.minBy(_._1)).toSeq
    val batch = QueriesExt.cleanGates(
        firstCopies.toDF("doc_id", "ts", "text"), Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == batch)
    assert(got.keySet == Set(1L, 6L), s"got $got")
  }
}
