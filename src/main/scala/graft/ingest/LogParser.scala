package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** OpenSSH syslog parser — the reference's parse stage re-expressed as pure
  * Catalyst column expressions (whole-stage-codegen friendly; zero UDFs).
  *
  * Semantics mirror `/root/reference/src/parse_logs.py` exactly:
  *   - line grammar + match-or-drop filter (parse_logs.py:11-13)
  *   - ip single-regex alternation, group-1-preferred (parse_logs.py:16-17)
  *   - user first-match cascade of three patterns (parse_logs.py:19-22)
  *   - field extractors, with Python's None for "no match" and empty string
  *     for present-but-empty captures like `logname=` (parse_logs.py:24-46)
  *   - 11-way first-match event classifier (parse_logs.py:48-69)
  *   - protocol_version / 4-way disconnect_reason (parse_logs.py:71-82)
  * plus the dashboard's derived `datetime` with the hard-coded year 2024
  * (stats_dashboard.py:25-28).
  *
  * Scale note: this is a narrow map-only pipeline — `text scan → project →
  * filter` with no shuffle. On a cluster it parallelizes by input split;
  * every expression stays inside one WholeStageCodegen stage.
  */
object LogParser {

  /** Line grammar: `Month Day HH:MM:SS host sshd[pid]: message`. Anchored at
    * line start (`^`) to match the reference's `re.match` semantics
    * (parse_logs.py:13) — a line with a garbage prefix is dropped, not
    * parsed from mid-line.
    */
  val LinePattern = """^(\w+)\s+(\d+)\s+([\d:]+)\s+(\S+)\s+sshd\[(\d+)\]:\s+(.*)"""

  /** Unanchored single-group extract; no-match → null (Python None parity). */
  // NOTE: the per-column ip/user/protocol extraction lives ONLY in the
  // fused slot-based path inside [[parse]] (one MultiRegexpFirstMatch
  // kernel evaluation per row) — standalone per-column helpers existed
  // here once, drifted from the slot path's empty-string semantics, and
  // were deleted rather than left as diverging duplicates.

  /** 11-way first-match substring classifier (order is semantic). */
  def eventCol(message: Column): Column =
    when(message.contains("Invalid user"), "invalid_user")
      .when(message.contains("Failed password"), "failed_password")
      .when(message.contains("authentication failure"), "auth_failure")
      .when(message.contains("reverse mapping"), "reverse_mapping_check")
      .when(message.contains("Connection closed"), "connection_closed")
      .when(message.contains("Received disconnect"), "disconnect")
      .when(message.contains("Did not receive identification string"), "no_identification")
      .when(message.contains("Too many authentication failures"), "too_many_failures")
      .when(message.contains("ignoring max retries"), "ignoring_max_retries")
      .when(message.contains("Failed none"), "failed_none")
      .otherwise("other")

  /** 4-way disconnect classifier; last arm is case-insensitive. */
  def disconnectReasonCol(message: Column): Column =
    when(message.contains("Received disconnect"), "received_disconnect")
      .when(message.contains("Connection closed"), "connection_closed")
      .when(message.contains("Disconnected from"), "disconnected")
      .when(lower(message).contains("timeout"), "timeout")

  /** The 13 per-field message patterns, fused into ONE
    * [[graft.functions.NativeExpressions.MultiRegexpFirstMatch]] pass in
    * [[parse]]. Order is layout, not priority — each pattern is searched
    * independently (so `user=` still matches inside `ruser=...`, exactly
    * like the reference's unanchored re.search, parse_logs.py:19-46).
    * `slot(i, g)` maps (pattern, group) → flat array index.
    */
  private val fieldPatterns: Seq[String] = Seq(
    """from ([\d\.]+)|\[(\d+\.\d+\.\d+\.\d+)\]""", // 0: ip (2 groups)
    """Invalid user (\S+)""",                      // 1: user cascade arm 1
    """user=(\S+)""",                              // 2: user cascade arm 2
    """for (\w+) from""",                          // 3: user cascade arm 3
    """port (\d+)""",                              // 4
    """rhost=([^\s]+)""",                          // 5
    """tty=([^\s]+)""",                            // 6
    """logname=([^\s]*)""",                        // 7 (empty capture legal)
    """uid=(\d+)""",                               // 8
    """euid=(\d+)""",                              // 9
    """ruser=([^\s]*)""",                          // 10 (empty capture legal)
    """pam_(\w+)\(sshd:(\w+)\)""",                 // 11: method (2 groups)
    """ssh(\d)""")                                 // 12: protocol version
  private val slotOffsets: Seq[Int] =
    graft.functions.NativeExpressions.multiRegexpSlotOffsets(fieldPatterns)
  private def slot(fields: Column, pattern: Int, group: Int = 1): Column =
    fields.getItem(slotOffsets(pattern) + group - 1)

  /** Dashboard-derived timestamp: hard-coded year 2024, `%Y %b %d %H:%M:%S`,
    * null on parse failure (pandas errors='coerce' parity). The hour
    * pattern is `H` (1-2 digits), not strict `HH`: pandas' %H accepts a
    * single-digit hour, and a strict pattern would silently drop such
    * rows through prepare()'s dropna — syslog normally zero-pads, so this
    * only matters for nonconforming sources, where dropping data beats
    * nothing but pandas keeps it.
    */
  def datetimeCol(month: Column, day: Column, time: Column): Column =
    try_to_timestamp(
      concat_ws(" ", lit("2024"), month, day.cast("string"), time),
      lit("yyyy MMM d H:mm:ss"))

  /** Suspicious/Normal binary label (stats_dashboard.py:82-83). */
  val suspiciousEvents: Seq[String] = Seq("failed_password", "invalid_user", "auth_failure")
  def eventTypeCol(event: Column): Column =
    when(event.isin(suspiciousEvents: _*), "Suspicious").otherwise("Normal")

  /** Full parse: raw-line DataFrame (one string column) → 19-column table +
    * `datetime`. Non-matching lines are dropped (match-or-drop semantics).
    * Works identically on batch (`spark.read.text`) and streaming
    * (`spark.readStream.text`) inputs — it is a stateless projection.
    */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val l = col(lineCol)
    // ONE search of the line grammar yields all six groups (the per-group
    // regexp_extract form re-ran the same regex 7×/row: 6 extracts + the
    // pushed-down match-or-drop filter).
    val g = col("_line_groups")
    val parsed = lines
      .withColumn("_line_groups",
        graft.functions.NativeExpressions.regexpGroups(l, LinePattern))
      .filter(g.isNotNull) // match-or-drop (parse_logs.py:13)
      .withColumn("month", g.getItem(0))
      .withColumn("day", g.getItem(1).cast(IntegerType))
      .withColumn("time", g.getItem(2))
      .withColumn("host", g.getItem(3))
      .withColumn("pid", g.getItem(4).cast(IntegerType))
      .withColumn("message", g.getItem(5))
      .drop("_line_groups")

    val m = col("message")
    // ONE fused kernel searches all 13 field patterns per row (was 13
    // independent regexp expressions, each converting the string again).
    // Slot semantics: null = pattern absent, "" = present-but-empty capture
    // — so the logname/ruser contains()-probe and the per-field
    // nullif(...,'') wrappers fall away (their groups are +/\d classes that
    // can never capture "", except logname/ruser where "" is the point).
    val f = col("_fields")
    parsed
      .withColumn("_fields",
        graft.functions.NativeExpressions.multiRegexpFirstMatch(m, fieldPatterns))
      .withColumn("ip", coalesce(slot(f, 0, 1), slot(f, 0, 2)))
      .withColumn("user", coalesce(slot(f, 1), slot(f, 2), slot(f, 3)))
      .withColumn("port", slot(f, 4).cast(IntegerType))
      .withColumn("event", eventCol(m))
      .withColumn("rhost", slot(f, 5))
      .withColumn("tty", slot(f, 6))
      .withColumn("logname", slot(f, 7))
      .withColumn("uid", slot(f, 8).cast(IntegerType))
      .withColumn("euid", slot(f, 9).cast(IntegerType))
      .withColumn("ruser", slot(f, 10))
      .withColumn("method", slot(f, 11, 1))
      .withColumn("protocol_version",
        when(slot(f, 12).isNotNull, concat(lit("ssh"), slot(f, 12))))
      .withColumn("disconnect_reason", disconnectReasonCol(m))
      .withColumn("datetime", datetimeCol(col("month"), col("day"), col("time")))
      .drop(lineCol, "_fields")
  }
}
