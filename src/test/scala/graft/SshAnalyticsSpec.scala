package graft

import graft.analytics.SshAnalytics
import graft.ingest.LogParser
import org.apache.spark.sql.functions._

/** End-to-end reference workload: raw SSH lines → parse → the dashboard's
  * global metrics and one-pass per-IP summary, hand-checked.
  */
class SshAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // attacker 10.0.0.1: 2 failed passwords (root) on 2 ports + 1 invalid user;
  // benign 10.0.0.2: 1 accepted ("other")
  private val lines = Seq(
    "Dec 10 07:00:01 h sshd[1]: Failed password for root from 10.0.0.1 port 1111 ssh2",
    "Dec 10 07:00:02 h sshd[2]: Failed password for root from 10.0.0.1 port 2222 ssh2",
    "Dec 10 07:00:03 h sshd[3]: Invalid user admin from 10.0.0.1",
    "Dec 10 07:00:04 h sshd[4]: Accepted password for alice from 10.0.0.2 port 3333 ssh2")

  private lazy val parsed = LogParser.parse(lines.toDF("value")).cache()

  test("globalMetrics over parsed lines") {
    val m = SshAnalytics.globalMetrics(parsed).head()
    assert(m.getAs[Long]("total_records") == 4)
    assert(m.getAs[Long]("unique_users") == 3) // root, admin, alice
    assert(m.getAs[Long]("unique_ips") == 2)
    assert(m.getAs[Long]("failed_events") == 3)
    assert(m.getAs[Double]("failed_rate_pct") == 75.0)
  }

  test("ipEventSummary: one-pass per-IP aggregate with score and profile") {
    val s = SshAnalytics.ipEventSummary(parsed).collect()
    assert(s.length == 2)
    val attacker = s.head // sorted by score desc
    assert(attacker.getAs[String]("ip") == "10.0.0.1")
    assert(attacker.getAs[Long]("failed_password") == 2)
    assert(attacker.getAs[Long]("invalid_user") == 1)
    assert(attacker.getAs[Long]("total_events") == 3)
    assert(attacker.getAs[Long]("distinct_source_ports") == 2)
    assert(attacker.getAs[scala.collection.Seq[String]]("source_ports_list").toSeq == Seq("1111", "2222"))
    assert(attacker.getAs[Long]("failed_logins") == 3)
    assert(attacker.getAs[scala.collection.Seq[String]]("failed_users").toSeq == Seq("admin", "root"))
    assert(attacker.getAs[Long]("tried_root_admin") == 3) // root,root,admin
    assert(attacker.getAs[Long]("event_diversity") == 2)
    // score = 2·3 + 3·2 + 0.5·3 + 15·1 + 1·2 = 30.5
    assert(attacker.getAs[Double]("suspicious_score") == 30.5)
    val benign = s(1)
    assert(benign.getAs[String]("ip") == "10.0.0.2")
    // 2·0 + 3·1(port) + 0.5·1(total) + 15·0 + 1·1(diversity) = 4.5
    assert(benign.getAs[Double]("suspicious_score") == 4.5)
  }

  test("topKWithOthers rolls the tail into Others") {
    val counts = Seq(("a", 10L), ("b", 8L), ("c", 5L), ("d", 2L), ("e", 1L))
      .toDF("name", "cnt")
    val out = SshAnalytics.topKWithOthers(counts, "name", "cnt", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L, "b" -> 8L, "c" -> 5L, "Others" -> 3L))
  }

  test("topKWithOthers: a NULL name never takes a top-k slot — it rolls into Others") {
    // the null group is the LARGEST count; without the candidacy
    // exclusion it would claim a slot (and then fall to Others anyway
    // through the null-unsafe membership probe, silently shrinking top-k
    // to k-1 real names — the r14 fuzz-gate divergence)
    val counts = Seq((null.asInstanceOf[String], 99L), ("a", 10L), ("b", 8L),
      ("c", 5L), ("d", 2L)).toDF("name", "cnt")
    val out = SshAnalytics.topKWithOthers(counts, "name", "cnt", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L, "b" -> 8L, "c" -> 5L, "Others" -> 101L))
  }
}
