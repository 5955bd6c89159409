package graft

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** flatMapGroupsWithState sessionization: gap-based close + terminal-event
  * close (semantics session_window cannot express), on both a MemoryStream
  * and batch-style input.
  */
class CustomSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sessions close on gap and on terminal event type") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    mem.addData(Seq(
      ("u1", t(0), "view"), ("u1", t(2), "click"), ("u1", t(3), "purchase"), // terminal
      ("u1", t(5), "view"),                                                 // new session, left open
      ("u2", t(0), "view"), ("u2", t(30), "view")                           // gap close at 10-min gap
    ))
    val sessions = StreamingAnalytics.customSessions(
      mem.toDS(), gapMillis = 10 * 60 * 1000, terminalType = "purchase")
    val q = sessions.writeStream.format("memory").queryName("custom_sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("custom_sessions")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(3), r.getString(4)))
      .toSet
    // u1: one 3-event session closed by the purchase; the t(5) view stays open (no output)
    assert(out.contains(("u1", t(0), 3L, "terminal")))
    // u2: first view closed by the 30-min gap when the second arrived
    assert(out.contains(("u2", t(0), 1L, "gap")))
    assert(out.size == 2)
  }
}
