package graft

import graft.ingest.LogParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.2): generated syslog lines → parse →
  * invariants. Parsing is total, drop-only-on-grammar-mismatch, and every
  * derived column stays within its domain. Uses raw scalacheck generators
  * with fixed seeds (scalatest bridge not in the offline cache).
  */
class LogParserPropSpec extends SparkSpec {
  import spark.implicits._

  private val months = Gen.oneOf("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val ip = for {
    a <- Gen.choose(1, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(1, 255)
  } yield s"$a.$b.$c.$d"
  private val user = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))

  private val message: Gen[String] = Gen.oneOf[Gen[String]](
    for { u <- user; i <- ip } yield s"Invalid user $u from $i",
    for { u <- user; i <- ip; p <- Gen.choose(1024, 65535) }
      yield s"Failed password for $u from $i port $p ssh2",
    for { i <- ip } yield s"Connection closed by $i [preauth]",
    for { i <- ip } yield s"Received disconnect from $i: 11:  [preauth]",
    for { i <- ip } yield s"Did not receive identification string from $i",
    Gen.const(Gen.const("error: Received signal 15; terminating."))
  ).flatMap(identity)

  private val validLine = for {
    mo <- months; day <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    pid <- Gen.choose(1, 99999); msg <- message
  } yield f"$mo $day $h%02d:$mi%02d:$s%02d host sshd[$pid]: $msg"

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val eventTags = Set("invalid_user", "failed_password", "auth_failure",
    "reverse_mapping_check", "connection_closed", "disconnect",
    "no_identification", "too_many_failures", "ignoring_max_retries",
    "failed_none", "other")
  private val ipPat = """\d+\.\d+\.\d+\.\d+""".r

  test("valid lines parse totally with in-domain derived columns") {
    (1L to 5L).foreach { seed =>
      val lines = sample(Gen.listOfN(30, validLine), seed)
      val parsed = LogParser.parse(lines.toDF("value")).collect()
      assert(parsed.length == lines.length, s"seed=$seed dropped a valid line")
      parsed.foreach { r =>
        assert(eventTags.contains(r.getAs[String]("event")))
        val ipv = r.getAs[String]("ip")
        assert(ipv == null || ipPat.matches(ipv))
        val dt = r.getAs[java.sql.Timestamp]("datetime")
        assert(dt == null || dt.toInstant.toString.startsWith("2024-"))
      }
    }
  }

  test("grammar-mismatched lines are always dropped") {
    (1L to 5L).foreach { seed =>
      val garbage = sample(Gen.listOfN(10, Gen.asciiPrintableStr), seed)
        .map(s => s"garbage $s") // can never match the anchored Month-first grammar
      val parsed = LogParser.parse(garbage.toDF("value")).collect()
      assert(parsed.isEmpty, s"seed=$seed parsed garbage")
    }
  }
}
