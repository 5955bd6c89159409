package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-8 warehouse/window additions
  * (unpivot, SCD2 history, blocked fuzzy join, exact-sum correlation,
  * EWMA, ntile deciles). The registry oracles prove each hash-exact vs
  * DuckDB; these prove the shapes behave like the operations they claim
  * to be.
  */
class WarehouseOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d16_unpivot: pivot→unpivot round-trips to the direct group-count") {
    val melted = SparkEntry.queries("d16_unpivot")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val direct = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(melted == direct, "melt(pivot(x)) == x for the non-zero cells")
    assert(melted.forall(_._3 > 0), "zero fill dropped")
  }

  test("j12_scd2_history: versions are dense, intervals chain, runs partition the timeline") {
    val rows = SparkEntry.queries("j12_scd2_history")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        "version_n dense from 1")
      assert(sorted.count(_.getBoolean(6)) == 1, "exactly one current version")
      assert(sorted.last.getBoolean(6) && sorted.last.isNullAt(4),
        "the current version is the last one and is open-ended")
      // consecutive runs have different types; intervals chain exactly
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2), "adjacent runs differ in state")
          assert(a.getTimestamp(4) == b.getTimestamp(3),
            "valid_to == next valid_from (half-open chain)")
        case _ =>
      }
      assert(sorted.map(_.getLong(5)).sum == totals(uid),
        "run lengths partition the user's events")
      assert(sorted.forall(_.getLong(5) > 0))
    }
  }

  test("j13_fuzzy_join: every probe resolves; distances bounded; clean names match themselves") {
    val rows = SparkEntry.queries("j13_fuzzy_join")(spark, sf).collect()
    val nProbes = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 7 === 3).count()
    assert(rows.length == nProbes,
      "the typo model preserves the blocking key, so every probe must resolve")
    rows.foreach { r =>
      val (probeName, matchName, dist) = (r.getString(1), r.getString(3), r.getInt(4))
      assert(dist >= 0 && dist <= 2)
      if (probeName == matchName) assert(dist == 0)
      // the block key (digits 1-7) always agrees between probe and match
      assert(probeName.substring(9, 16) == matchName.substring(9, 16))
    }
    // a probe whose last two digits are equal is unmutated → exact self-match
    rows.filter { r => val n = r.getString(1); n(16) == n(17) }.foreach { r =>
      assert(r.getInt(4) == 0 && r.getLong(0) == r.getLong(2),
        "identity probes match their own key at distance 0")
    }
  }

  test("a26_corr_stats: exact-sum correlation ≡ Spark's native corr, |r| ≤ 1, n partitions the table") {
    val rows = SparkEntry.queries("a26_corr_stats")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    val native = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(corr(col("value"), hour(col("ts")).cast("double")).as("c")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(math.abs(c) <= 1.0)
      assert(math.abs(c - native(r.getString(0))) < 1e-9,
        s"exact-sum corr agrees with streaming corr for ${r.getString(0)}")
    }
  }

  test("a27_ewma: first event passes through; fold matches a reference EWMA; bounded by the window") {
    val out = SparkEntry.queries("a27_ewma")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == ev.length, "one smoothed row per event")
    val ewmaByEvent = out.map(t => t._1 -> t._3).toMap
    ev.groupBy(_._2).foreach { case (_, hist) =>
      val ordered = hist.sortBy(_._1)
      ordered.zipWithIndex.foreach { case ((eid, _, _), i) =>
        val lookback = ordered.slice(math.max(0, i - 7), i + 1).map(_._3)
        val expected = lookback.tail.foldLeft(lookback.head)((acc, x) => 0.5 * x + 0.5 * acc)
        assert(ewmaByEvent(eid) == expected, s"fold mismatch at event $eid")
        assert(ewmaByEvent(eid) >= lookback.min && ewmaByEvent(eid) <= lookback.max)
      }
    }
  }

  test("a28_attribution: purchases and revenue conserved across attribution buckets") {
    val rows = SparkEntry.queries("a28_attribution")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).forall(h => h == -1 || (h >= 0 && h <= 23)))
    assert(rows.map(_.getInt(0)).distinct.length == rows.length, "one row per bucket")
    val ev = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    assert(rows.map(_.getLong(1)).sum == ev.count(),
      "every purchase lands in exactly one bucket (attributed or -1)")
    val totalRev = ev.agg(sum(col("value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(math.abs(rows.map(_.getDouble(2)).sum - totalRev) < 1e-6,
      "attribution redistributes revenue, never creates or loses it")
  }

  test("a29_peak_concurrency: day-partitioned sweep equals a direct interval-overlap count") {
    val out = SparkEntry.queries("a29_peak_concurrency")(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, carry, peak, _) => assert(peak >= carry && carry >= 0) }
    // rebuild sessions locally (same 2h-gap rule) and check peaks directly
    val evs = Tables.events(spark, sf).select("user_id", "event_id", "ts").collect()
      .map { r =>
        val t = r.getTimestamp(2) // exact µs: getTime alone floors to ms
        (r.getLong(0), r.getLong(1),
          math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
      }
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(_._2).map(_._3)
      ts.tail.foldLeft(List((ts.head, ts.head))) { case (acc @ ((s0, e0) :: rest), t) =>
        if (t - e0 > 7200000000L) (t, t) :: acc else (s0, t) :: rest
      }
    }.toSeq
    assert(out.map(_._4).sum == sessions.size, "sessions_started partitions the session set")
    val dayOf = (us: Long) => java.time.Instant.ofEpochSecond(us / 1000000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    out.foreach { case (day, carry, peak, _) =>
      val dayStartUs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L
      val expectedCarry = sessions.count { case (s0, e0) => s0 < dayStartUs && e0 >= dayStartUs }
      assert(carry == expectedCarry, s"$day carry")
      val candidates = sessions.collect { case (s0, _) if dayOf(s0) == day => s0 }
        .map(t => sessions.count { case (s0, e0) => s0 <= t && e0 >= t }.toLong)
      assert(peak == (candidates :+ expectedCarry.toLong).max, s"$day peak")
    }
  }

  test("g4_pagerank: exact fixed-point parity with a local reference; mass and floor invariants") {
    val out = SparkEntry.queries("g4_pagerank")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // local reference: same edge extraction + 3 integer-floored iterations
    val S = 1048576L
    val kPat = "\"k\":\\s*(\\d+)".r
    val rows = Tables.events(spark, sf).select("user_id", "event_id", "props").collect()
      .flatMap(r => kPat.findFirstMatchIn(r.getString(2))
        .map(m => (r.getLong(0), r.getLong(1), m.group(1).toInt)))
    val edges = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ks = es.sortBy(_._2).map(_._3)
      ks.zip(ks.tail).filter { case (a, b) => a != b }
    }.groupBy(identity).map { case ((s0, d0), g) => (s0, d0, g.size.toLong) }.toSeq
    val wout = edges.groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    var rank = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s0, _, w) => (rank(s0) * w) / wout(s0) }.sum
      }
      rank = nodes.map(nd => nd -> ((15L * S) / (100L * n) + 85L * contrib.getOrElse(nd, 0L) / 100L)).toMap
    }
    assert(out.keySet == rank.keySet)
    rank.foreach { case (nd, r) => assert(out(nd) == r, s"node $nd exact fixed-point match") }
    // every node holds at least the teleport mass; total mass ≈ S (floor leak only)
    val teleport = (15L * S) / (100L * n)
    assert(out.values.forall(_ >= teleport))
    val total = out.values.sum
    assert(total <= S && total > (S * 9) / 10, s"rank mass conserved up to floor leak: $total")
  }

  test("w7_ntile_deciles: 10 near-equal buckets per type, ordered and exhaustive") {
    val rows = SparkEntry.queries("w7_ntile_deciles")(spark, sf).collect()
    val totals = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, ds) =>
      val sorted = ds.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10), "all 10 deciles present")
      val counts = sorted.map(_.getLong(2))
      assert(counts.sum == totals(tpe), "deciles partition the group")
      assert(counts.max - counts.min <= 1, "ntile balance: sizes differ by ≤1")
      sorted.foreach(r => assert(r.getDouble(3) <= r.getDouble(4), "lo ≤ hi"))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3),
          "value ranges are ordered across deciles")
        case _ =>
      }
    }
  }
}
