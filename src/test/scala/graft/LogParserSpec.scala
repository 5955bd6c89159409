package graft

import graft.ingest.LogParser
import org.apache.spark.sql.Row

/** Parser parity spec against the reference grammar
  * (/root/reference/src/parse_logs.py) using the FIXTURES.md line corpus:
  * all 11 event classes, every secondary extractor, null discipline,
  * cascade priorities, match-or-drop (anchored), year-2024 datetime.
  */
class LogParserSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "Dec 10 06:55:46 LabSZ sshd[24200]: Invalid user webmaster from 173.234.31.186",
    "Dec 10 07:07:45 LabSZ sshd[24206]: Failed password for invalid user test9 from 52.80.34.196 port 36060 ssh2",
    "Dec 10 07:07:38 LabSZ sshd[24206]: pam_unix(sshd:auth): authentication failure; logname= uid=0 euid=0 tty=ssh ruser= rhost=52.80.34.196  user=root",
    "Dec 10 06:55:46 LabSZ sshd[24200]: reverse mapping checking getaddrinfo for ns.example.com [173.234.31.186] failed - POSSIBLE BREAK-IN ATTEMPT!",
    "Dec 10 07:08:28 LabSZ sshd[24208]: Connection closed by 52.80.34.196 [preauth]",
    "Dec 10 07:27:50 LabSZ sshd[24245]: Received disconnect from 112.95.230.3: 11:  [preauth]",
    "Dec 10 09:12:32 LabSZ sshd[24490]: Did not receive identification string from 190.167.74.204",
    "Dec 10 09:31:12 LabSZ sshd[24537]: Disconnecting: Too many authentication failures for admin [preauth]",
    "Dec 10 11:28:17 LabSZ sshd[25527]: PAM service(sshd) ignoring max retries; 6 > 3",
    "Dec 10 09:30:33 LabSZ sshd[24532]: Failed none for invalid user 0 from 208.109.54.135 port 51158 ssh2",
    "Dec 10 09:32:20 LabSZ sshd[24680]: Accepted password for fztu from 119.137.62.142 port 49116 ssh2",
    "Dec 10 09:32:20 LabSZ CRON[1234]: (root) CMD (run-parts /etc/cron.hourly)", // dropped: not sshd
    "xx Dec 10 09:32:20 LabSZ sshd[9]: Failed password for root from 1.2.3.4 port 1 ssh2" // dropped: garbage prefix (anchored)
  )

  private lazy val parsed = LogParser.parse(lines.toDF("value")).collect()
  private def byPid(pid: Int): Row = parsed.find(_.getAs[Int]("pid") == pid).get

  test("match-or-drop: non-sshd and prefix-garbled lines are dropped") {
    assert(parsed.length == 11) // 13 lines, 2 dropped
  }

  test("11-way event classifier: first-match order (reference quirks intact)") {
    val events = parsed.map(_.getAs[String]("event")).toSeq
    // NOTE: "Too many authentication failures" contains "authentication
    // failure", which the reference checks FIRST (parse_logs.py:52) — so the
    // too_many_failures arm is unreachable in the reference too. We preserve
    // that first-match semantics exactly.
    assert(events.count(_ == "auth_failure") == 2) // pam line + too-many line
    assert(events.toSet == Set("invalid_user", "failed_password", "auth_failure",
      "reverse_mapping_check", "connection_closed", "disconnect",
      "no_identification", "ignoring_max_retries", "failed_none", "other"))
  }

  test("ip alternation: 'from x.x.x.x' preferred, bracket fallback") {
    assert(byPid(24200).getAs[String]("ip") == "173.234.31.186") // both rows pid 24200... first
    val rev = parsed.find(_.getAs[String]("event") == "reverse_mapping_check").get
    assert(rev.getAs[String]("ip") == "173.234.31.186") // bracket arm
    val closed = parsed.find(_.getAs[String]("event") == "connection_closed").get
    assert(closed.getAs[String]("ip") == null) // 'by x.x.x.x' matches neither arm
  }

  test("user cascade: Invalid-user > user= > for-from") {
    assert(parsed.find(_.getAs[String]("event") == "invalid_user").get
      .getAs[String]("user") == "webmaster")
    assert(parsed.find(_.getAs[String]("event") == "auth_failure").get
      .getAs[String]("user") == "root") // user= arm
    // 'for (\w+) from' needs ONE word between for/from — "for invalid user
    // test9 from" matches none of the three patterns → null (reference parity)
    assert(parsed.find(_.getAs[String]("event") == "failed_password").get
      .getAs[String]("user") == null)
    assert(parsed.find(_.getAs[String]("event") == "other").get
      .getAs[String]("user") == "fztu")
  }

  test("secondary extractors with null-vs-empty discipline") {
    val pam = parsed.find(_.getAs[String]("event") == "auth_failure").get
    assert(pam.getAs[String]("logname") == "") // key present, empty value
    assert(pam.getAs[String]("ruser") == "")
    assert(pam.getAs[Int]("uid") == 0 && pam.getAs[Int]("euid") == 0)
    assert(pam.getAs[String]("tty") == "ssh")
    assert(pam.getAs[String]("rhost") == "52.80.34.196")
    assert(pam.getAs[String]("method") == "unix")
    val fp = parsed.find(_.getAs[String]("event") == "failed_password").get
    assert(fp.getAs[Int]("port") == 36060)
    assert(fp.getAs[String]("protocol_version") == "ssh2")
    val inv = parsed.find(_.getAs[String]("event") == "invalid_user").get
    assert(inv.isNullAt(inv.fieldIndex("port")))
    assert(inv.isNullAt(inv.fieldIndex("logname"))) // key absent → null
    assert(inv.isNullAt(inv.fieldIndex("method")))
  }

  test("disconnect_reason 4-way classifier") {
    assert(parsed.find(_.getAs[String]("event") == "disconnect").get
      .getAs[String]("disconnect_reason") == "received_disconnect")
    assert(parsed.find(_.getAs[String]("event") == "connection_closed").get
      .getAs[String]("disconnect_reason") == "connection_closed")
    assert(parsed.find(_.getAs[String]("event") == "invalid_user").get
      .getAs[String]("disconnect_reason") == null)
  }

  test("datetime: hard-coded year 2024, null on bad parse") {
    val ts = parsed.find(_.getAs[String]("event") == "invalid_user").get
      .getAs[java.sql.Timestamp]("datetime")
    assert(ts.toInstant.toString == "2024-12-10T06:55:46Z")
  }

  test("suspicious/normal label") {
    import org.apache.spark.sql.functions.col
    val df = LogParser.parse(lines.toDF("value"))
      .select(col("event"), LogParser.eventTypeCol(col("event")).as("label"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("failed_password") == "Suspicious" && m("invalid_user") == "Suspicious" &&
      m("auth_failure") == "Suspicious" && m("connection_closed") == "Normal")
  }
}
