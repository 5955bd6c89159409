package graft

import graft.operators.TemporalJoins
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  // rights (clicks): (user, ts, id, value)
  private val rights = Seq(
    (1L, t(0), 100L, 1.0), (1L, t(10), 101L, 2.0), (1L, t(10), 102L, 3.0),
    (2L, t(30), 200L, 9.0)
  ).toDF("user_id", "ts", "event_id", "value")

  // lefts (purchases)
  private val lefts = Seq(
    (1L, t(5), 500L, 0.0),   // after click 100 → match 100
    (1L, t(10), 501L, 0.0),  // ties with clicks 101/102 → max id 102 wins
    (1L, t(50), 502L, 0.0),  // → 102 (latest ts 10:10, max id)
    (2L, t(20), 503L, 0.0),  // before user-2's only click → null
    (3L, t(20), 504L, 0.0)   // user with no clicks → null
  ).toDF("user_id", "ts", "event_id", "value")

  test("asOfJoin: backward match with <= and max-ord tie-break") {
    val out = TemporalJoins
      .asOfJoin(lefts, rights, "user_id", "ts", "ts", "event_id", Seq("value"))
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(500L) == 100L)
    assert(out(501L) == 102L) // same-ts click visible; greatest event_id wins
    assert(out(502L) == 102L)
    assert(out(503L) == -1L)
    assert(out(504L) == -1L)
  }

  test("asOfJoin: a right row with NULL ts never matches (rts <= lts contract)") {
    // ascending sort places NULL first — without the null filter the
    // null-ts click would become the running match for every purchase
    // preceding all real clicks
    val nullRights = Seq(
      (2L, Option.empty[Timestamp], 300L, 5.0),
      (2L, Some(t(30)), 200L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TemporalJoins
      .asOfJoin(lefts.filter($"user_id" === 2L), nullRights,
        "user_id", "ts", "ts", "event_id", Seq("value"))
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(503L) == -1L) // t(20) precedes the only real click; null click must NOT match
  }

  test("rangeJoinCount: [ts - window, ts) counts incl. bin-boundary cases") {
    val out = TemporalJoins
      .rangeJoinCount(lefts, rights, "user_id", "ts", "ts", "event_id",
        windowMicros = 10L * 60 * 1000000) // 10-minute window
      .select("event_id", "window_count")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 500 @10:05: clicks in [09:55,10:05) → click@10:00 → 1
    assert(out(500L) == 1L)
    // 501 @10:10: [10:00,10:10) → click@10:00 only (10:10 excluded) → 1
    assert(out(501L) == 1L)
    // 502 @10:50: [10:40,10:50) → 0
    assert(out(502L) == 0L)
    // 503 user2 @10:20: click@10:30 is AFTER → 0
    assert(out(503L) == 0L)
    assert(out(504L) == 0L)
  }

  test("rangeJoinCount rejects a non-positive window loudly") {
    // zero would die later with a bare ANSI divide-by-zero; NEGATIVE would
    // silently return all-zero counts (contradictory range predicate)
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinCount(lefts, rights, "user_id", "ts", "ts",
        "event_id", windowMicros = -3600000000L)
    }
    assert(e.getMessage.contains("windowMicros"))
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinCount(lefts, rights, "user_id", "ts", "ts",
        "event_id", windowMicros = 0L)
    }
  }

  test("working-column collisions fail fast instead of silently dropping data") {
    // withColumn REPLACES an existing column of the same name; the
    // operator then drops it — the caller's column would vanish silently
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(lefts.withColumn("asof", $"value"), rights,
        "user_id", "ts", "ts", "event_id", Seq("value"))
    }
    assert(e1.getMessage.contains("asof"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinCount(lefts.withColumn("window_count", $"value"),
        rights, "user_id", "ts", "ts", "event_id", windowMicros = 1000000L)
    }
    assert(e2.getMessage.contains("window_count"))
  }

  test("rangeJoinCount's exploded build side sits behind a stage boundary (blind-broadcast guard)") {
    // the static planner costs the exploded side at its slim PRE-explode
    // estimate; the repartition boundary makes AQE size the runtime rows
    val out = TemporalJoins.rangeJoinCount(lefts, rights, "user_id", "ts",
      "ts", "event_id", windowMicros = 600000000L)
    val boundaries = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }
    assert(boundaries.nonEmpty)
  }
}
