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
}
