package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query per operator of SURVEY.md §2 (+ north-star
  * extensions), each with a DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout (the oracle compare is a
  * value hash, so results must match bit-for-bit):
  *   - counts/ints: always exact.
  *   - double sums/avgs: sum in decimal(18,2) (exact), cast the final value
  *     to double — both engines convert the same exact decimal.
  *   - scalar double expressions: written with the SAME shape/order on both
  *     sides; IEEE-754 makes them bit-identical. No engine-native round()
  *     on doubles (half-case behavior differs); where the reference rounds,
  *     we use floor(x·10^d + 0.5)/10^d on both sides.
  *   - timestamps: events.ts is ns in parquet; Spark truncates to µs on
  *     read, so oracle SQL casts to µs (`cast(ts as timestamp)`) first.
  *   - every query ends in a total ORDER BY (incl. tie-breaks); nullable
  *     sort keys get NULLS FIRST in DuckDB to match Spark's asc default.
  */
private[graft] final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Queries {

  // ---- shared columns -----------------------------------------------------
  /** `k` property extracted from the events.props JSON-ish string. */
  private val kPat = "\"k\":\\s*(\\d+)"
  private def kCol: Column = nullif(regexp_extract(col("props"), kPat, 1), lit("")).cast("int")
  private val kSql = """cast(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') as int)"""

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
  /** Cross-engine-stable HALF_UP rounding: floor(x·10^d + 0.5)/10^d. */
  private def rnd(c: Column, d: Int): Column =
    graft.functions.Rounding.roundAt(c, d) // ONE definition of the repo-wide HALF_UP rule

  /** The generator's event_type domain — ONE definition for every explicit
    * pivot/unpivot value list (a7's row-sum over the pivoted columns
    * silently under-counts vs its count(*) oracle for any type missing
    * from a stale local copy).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // ======================================================================
  // S/P — scans, projections, regex extraction (SURVEY §2.1, §2.2)
  // ======================================================================

  /** S5/D5/D14/T1: pruned scan + filter + projection. The filter and the
    * 3-column projection both push into the parquet scan.
    */
  private val s1 = QueryDef("s1_scan_project",
    Some("""SELECT event_id, event_type, value FROM events
           |WHERE value > 150 ORDER BY event_id""".stripMargin),
    (s, d) => ev(s, d)
      .select("event_id", "event_type", "value")
      .filter(col("value") > 150)
      .orderBy("event_id"))

  /** P1/P4: single-group regex extract with null-on-miss semantics. */
  private val p1 = QueryDef("p1_regex_extract",
    Some(s"""SELECT event_id, $kSql AS k FROM events ORDER BY event_id"""),
    (s, d) => ev(s, d).select(col("event_id"), kCol.as("k")).orderBy("event_id"))

  /** P2/P3: alternation + first-match cascade via coalesce(nullif(...)). */
  private val p2 = QueryDef("p2_coalesce_cascade",
    Some("""SELECT coalesce(nullif(regexp_extract(text, '(spark[a-z]*)', 1), ''),
           |                nullif(regexp_extract(text, '(hash[a-z]*)', 1), ''),
           |                'none') AS tag, count(*) AS cnt
           |FROM documents GROUP BY tag ORDER BY tag""".stripMargin),
    (s, d) => docs(s, d)
      .select(coalesce(
        nullif(regexp_extract(col("text"), "(spark[a-z]*)", 1), lit("")),
        nullif(regexp_extract(col("text"), "(hash[a-z]*)", 1), lit("")),
        lit("none")).as("tag"))
      .groupBy("tag").agg(count(lit(1)).as("cnt"))
      .orderBy("tag"))

  /** P6/P8: ordered multi-way contains classifier (first match wins). */
  private val p6 = QueryDef("p6_contains_classifier",
    Some("""SELECT CASE WHEN text LIKE '%spark%' THEN 'spark'
           |            WHEN text LIKE '%stream%' THEN 'stream'
           |            WHEN text LIKE '%window%' THEN 'window'
           |            WHEN translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') LIKE '%join%' THEN 'join'
           |            ELSE 'other' END AS category, count(*) AS cnt
           |FROM documents GROUP BY category ORDER BY category""".stripMargin),
    (s, d) => docs(s, d)
      .select(when(col("text").contains("spark"), "spark")
        .when(col("text").contains("stream"), "stream")
        .when(col("text").contains("window"), "window")
        .when(graft.functions.TextFunctions.asciiLower(col("text")).contains("join"), "join")
        .otherwise("other").as("category"))
      .groupBy("category").agg(count(lit(1)).as("cnt"))
      .orderBy("category"))

  /** P (rebuild extra): structured JSON parsing of the props column via
    * from_json with an explicit schema — the schema'd path (vs. the regex
    * extraction of p1) a production pipeline uses for JSON-ish fields.
    */
  private val p9 = QueryDef("p9_from_json",
    Some("""SELECT cast(json_extract_string(props, '$.k') as int) AS k, count(*) AS cnt
           |FROM events GROUP BY k ORDER BY k NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .select(from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
        .getField("k").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k"))

  /** P1-P8 end-to-end: synthesize an SSH-log line from each event row, run
    * the full LogParser over it, emit the parsed fields. The oracle computes
    * ground truth directly from the synthesis template — verifying the
    * parser's regex alternation, cascade priority, classifier order, null
    * discipline, and the year-2024 timestamp build.
    */
  private val ppOracle: Option[String] =
    Some("""SELECT event_id,
           |  CASE event_type WHEN 'error' THEN 'failed_password' WHEN 'signup' THEN 'invalid_user'
           |       WHEN 'purchase' THEN 'auth_failure' WHEN 'click' THEN 'connection_closed'
           |       ELSE 'disconnect' END AS event,
           |  CASE WHEN event_type IN ('purchase', 'click') THEN NULL
           |       ELSE '10.0.' || (user_id % 200) || '.' || (event_id % 250) END AS ip,
           |  CASE event_type WHEN 'error' THEN 'u' || user_id WHEN 'signup' THEN 'u' || user_id
           |       WHEN 'purchase' THEN 'root' ELSE NULL END AS user,
           |  CASE event_type WHEN 'error' THEN cast(1024 + event_id % 5000 AS int) ELSE NULL END AS port,
           |  CASE event_type WHEN 'error' THEN 'ssh2' ELSE NULL END AS protocol_version,
           |  CASE event_type WHEN 'click' THEN 'connection_closed'
           |       WHEN 'error' THEN NULL WHEN 'signup' THEN NULL WHEN 'purchase' THEN NULL
           |       ELSE 'received_disconnect' END AS disconnect_reason,
           |  CASE event_type WHEN 'purchase' THEN 'unix' ELSE NULL END AS method,
           |  make_timestamp(2024, 1, cast(event_id % 27 AS int) + 1, 3,
           |                 cast(event_id % 60 AS int), cast(user_id % 60 AS double)) AS datetime
           |FROM events
           |WHERE user_id IS NOT NULL
           |ORDER BY event_id""".stripMargin)

  /** Synthesized SSH lines from `events` → full LogParser output (the
    * shared front half of p_parse_ssh_roundtrip and pipe_ssh_docstore).
    */
  private def synthParsed(s: SparkSession, d: String): DataFrame = {
      // Codegen'd concat/lpad instead of format_string (r17): Spark's
      // FormatString routes every row through java.util.Formatter —
      // measured 0.40 s warm / 2.54 s cold vs 0.30 / 0.73 for the concat
      // form on this synthesis at sf0.1. Null semantics are equivalent
      // HERE (not in general): Formatter renders a null %d as the literal
      // "null", which lands in the line's day or time field (both ids
      // appear in the header) and fails the line grammar, while concat
      // nulls the whole line and regexpGroups drops it — either way the
      // row is dropped, matching the oracle's user_id IS NOT NULL filter.
      // tx_redact's synthesis keeps format_string: its nulls must RENDER.
      def n(c: Column): Column = c.cast("string")
      def ipTail: Column = concat(n(pmod(col("user_id"), lit(200))), lit("."),
        n(pmod(col("event_id"), lit(250))))
      val msg = when(col("event_type") === "error",
          concat(lit("Failed password for u"), n(col("user_id")),
            lit(" from 10.0."), ipTail, lit(" port "),
            n(lit(1024) + pmod(col("event_id"), lit(5000))), lit(" ssh2")))
        .when(col("event_type") === "signup",
          concat(lit("Invalid user u"), n(col("user_id")), lit(" from 10.0."), ipTail))
        .when(col("event_type") === "purchase",
          concat(lit("pam_unix(sshd:auth): authentication failure; logname= uid=0 euid=0 tty=ssh ruser= rhost=10.0."),
            ipTail, lit("  user=root")))
        .when(col("event_type") === "click",
          concat(lit("Connection closed by 10.0."), ipTail, lit(" [preauth]")))
        .otherwise(
          concat(lit("Received disconnect from 10.0."), ipTail, lit(": 11:  [preauth]")))
      val line = concat(
        lit("Jan "), n(pmod(col("event_id"), lit(27)) + 1),
        lit(" 03:"), lpad(n(pmod(col("event_id"), lit(60))), 2, "0"),
        lit(":"), lpad(n(pmod(col("user_id"), lit(60))), 2, "0"),
        lit(" host sshd["), n(col("event_id")), lit("]: "),
        msg)
      // The events file is a single parquet split at small SF, so without a
      // redistribution the CPU-heavy parse (14 regex searches + timestamp
      // parse per row) runs on ONE task while the rest of the cluster
      // idles. Shuffling the raw lines is cheap (narrow id+string rows)
      // relative to parsing them — the same call you'd make after reading
      // a non-splittable gzip log. Keyed on event_id for determinism.
      // Explicit partition count: a bare repartition(col) is an AQE
      // coalescible shuffle, and at ~10 MB the advisory size folds it back
      // to one partition — exactly the serialization being fixed.
      val raw = ev(s, d).select("event_id", "user_id", "event_type")
        .repartition(s.sparkContext.defaultParallelism, col("event_id"))
        .select(col("event_id"), line.as("value"))
      graft.ingest.LogParser.parse(raw)
    }

  private val pp = QueryDef("p_parse_ssh_roundtrip",
    ppOracle,
    (s, d) => synthParsed(s, d)
      .select("event_id", "event", "ip", "user", "port", "protocol_version",
        "disconnect_reason", "method", "datetime")
      .orderBy("event_id"))

  /** The reference's ENTIRE three-stage pipeline, end to end, through the
    * real connector: parse raw SSH lines (main.py stage 1, parse_logs.py)
    * → insert the parsed STRING columns into the document store
    * (insert_mongo.py — like Mongo, the store holds strings; datetime is a
    * dashboard-side derivation) → read back with `find(filter, projection)`
    * (ip IS NOT NULL pushes into the connector, only 3 fields materialize)
    * → the dashboard's per-IP behavioral summary (stats_dashboard.py:103+:
    * totals, suspicious-event count, distinct users).
    */
  private val s12 = QueryDef("pipe_ssh_docstore",
    Some("""WITH parsed AS (
           |  SELECT
           |    CASE event_type WHEN 'error' THEN 'failed_password' WHEN 'signup' THEN 'invalid_user'
           |         WHEN 'purchase' THEN 'auth_failure' WHEN 'click' THEN 'connection_closed'
           |         ELSE 'disconnect' END AS event,
           |    CASE WHEN event_type IN ('purchase', 'click') THEN NULL
           |         ELSE '10.0.' || (user_id % 200) || '.' || (event_id % 250) END AS ip,
           |    CASE event_type WHEN 'error' THEN 'u' || user_id WHEN 'signup' THEN 'u' || user_id
           |         WHEN 'purchase' THEN 'root' ELSE NULL END AS user
           |  FROM events)
           |SELECT ip, count(*) AS total,
           |  cast(sum(CASE WHEN event IN ('failed_password', 'invalid_user', 'auth_failure')
           |               THEN 1 ELSE 0 END) as bigint) AS n_suspicious,
           |  count(DISTINCT user) AS n_users
           |FROM parsed WHERE ip IS NOT NULL
           |GROUP BY ip ORDER BY ip""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s12_docstore_${Integer.toHexString(d.hashCode)}"
      synthParsed(s, d).select("event", "ip", "user")
        .write.format("docstore").mode("overwrite").save(path)
      s.read.format("docstore").load(path)
        .filter(col("ip").isNotNull)
        .groupBy("ip")
        .agg(count(lit(1)).as("total"),
          cnt(col("event").isin("failed_password", "invalid_user", "auth_failure"))
            .as("n_suspicious"),
          count_distinct(col("user")).as("n_users"))
        .orderBy("ip")
    })

  /** S2/S3: CSV sink + re-scan with explicit schema (the reference's
    * parse→CSV→reload hop, parse_logs.py:110 / insert_mongo.py:7), then an
    * aggregate over the reloaded table. Long/string columns only — CSV
    * round-trips them exactly.
    */
  private val s2 = QueryDef("s2_csv_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt, cast(sum(user_id) as bigint) AS sum_users
           |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s2_csv_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id")
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("event_id LONG, event_type STRING, user_id LONG")
        .csv(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).as("sum_users"))
        .orderBy("event_type")
    })

  /** S4: parquet sink + re-scan (the rebuild's canonical store; the Mongo
    * hop of insert_mongo.py:9-15 is an exchange format, not a semantic
    * capability). Filter on the reloaded table pushes into the new scan.
    */
  private val s4 = QueryDef("s4_parquet_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events WHERE value > 100 GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s4_parquet_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path).filter(col("value") > 100)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): JSON-lines sink + re-scan with EXPLICIT schema —
    * the interchange format every ingest boundary still speaks. Explicit
    * schema matters at scale: inference reads the data twice and can
    * widen types differently per partition sample.
    */
  private val s9 = QueryDef("s9_jsonl_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt, cast(sum(user_id) as bigint) AS sum_users
           |FROM events WHERE user_id % 3 = 0 GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s9_jsonl_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id")
        .write.mode("overwrite").json(path)
      s.read.schema("event_id BIGINT, event_type STRING, user_id BIGINT").json(path)
        .filter(pmod(col("user_id"), lit(3)) === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).as("sum_users"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): ORC sink + re-scan — the other columnar format a
    * switching user may already store; predicate pushes into the ORC scan
    * the same as parquet.
    */
  private val s10 = QueryDef("s10_orc_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events WHERE value <= 100 GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s10_orc_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").orc(path)
      s.read.orc(path).filter(col("value") <= 100)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): Avro sink + re-scan — the row-oriented interchange
    * format of Kafka/schema-registry pipelines; a switching user's event
    * feed often lands as Avro before columnar conversion. Spark 4 bundles
    * the Avro source; the re-scan's filter still prunes via the reader's
    * row-level predicate (Avro has no columnar statistics — exactly why
    * the pipeline converts to parquet; the carrier documents both halves).
    * This Spark build ships the Avro classes inside spark-sql but without
    * the `avro` shortname's service registration, so the format is
    * addressed by its provider class name.
    */
  private val s17 = QueryDef("s17_avro_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events WHERE value > 50 GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s17_avro_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").format("org.apache.spark.sql.avro.AvroFileFormat").save(path)
      s.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(path).filter(col("value") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): XML sink + re-scan with an EXPLICIT schema (Spark
    * 4's built-in XML source) — enterprise log exports still ship XML; the
    * explicit schema avoids the inference pass a 100 TB directory cannot
    * afford, the same discipline as the S3 CSV re-scan.
    */
  private val s18 = QueryDef("s18_xml_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt, cast(sum(user_id) as bigint) AS sum_users
           |FROM events WHERE user_id % 3 = 0 GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s18_xml_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id")
        .write.mode("overwrite").option("rowTag", "event").format("xml").save(path)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, event_type STRING, user_id BIGINT")
      s.read.schema(schema).option("rowTag", "event").format("xml").load(path)
        .filter(col("user_id") % 3 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).cast("bigint").as("sum_users"))
        .orderBy("event_type")
    })

  /** S19 (rebuild extra): malformed-record handling on CSV ingest — the
    * robustness contract a 100 TB text feed needs: bad rows must neither
    * kill the job (FAILFAST) nor vanish silently (DROPMALFORMED's trap).
    * The carrier deterministically corrupts the `value` field of every
    * 37th event, re-reads with an explicit schema in PERMISSIVE mode and
    * a corrupt-record column, and reports good/bad counts plus the good
    * rows' sum — quarantine accounting, so lost data is a COUNTED number.
    * The oracle derives the same partition relationally from the
    * corruption rule.
    */
  private val s19 = QueryDef("s19_csv_malformed",
    Some("""SELECT cast(sum(CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END) as bigint) AS n_bad,
           |       cast(sum(CASE WHEN event_id % 37 <> 0 THEN 1 ELSE 0 END) as bigint) AS n_good,
           |       cast(sum(CASE WHEN event_id % 37 <> 0 THEN cast(value as decimal(18,2)) END) as double) AS sum_good
           |FROM events""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s19_csv_${Integer.toHexString(d.hashCode)}"
      // null value AND null event_type must still emit a 3-field line
      // ("id,,v") — concat_ws DROPS nulls, and a 2-field line shifts the
      // remaining fields left (the value lands in event_type and the row
      // silently loses it from sum_good). Empty string parses back to null.
      ev(s, d).select(concat_ws(",", col("event_id"),
          coalesce(col("event_type"), lit("")),
          when(col("event_id") % 37 === 0, lit("corrupted!"))
            .otherwise(coalesce(col("value").cast("string"), lit(""))))
          .as("value"))
        .write.mode("overwrite").text(path)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE, _bad STRING")
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        .agg(cnt(col("_bad").isNotNull).as("n_bad"),
          cnt(col("_bad").isNull).as("n_good"),
          sum(when(col("_bad").isNull, col("value").cast("decimal(18,2)")))
            .cast("double").as("sum_good"))
    })

  /** P10 (rebuild extra): semi-structured analytics through Spark 4's
    * VARIANT type — `parse_json` once into the binary variant encoding,
    * then typed `variant_get` path extraction, filter, and aggregate. The
    * schema-on-read answer for property bags whose shape drifts (the
    * regex kCol the other carriers use is the schema-free fallback; at
    * 100 TB a stored VARIANT column parses once at ingest and every query
    * after reads the binary encoding instead of re-tokenizing JSON text).
    * The oracle extracts the same path with DuckDB's JSON functions.
    */
  private val p10 = QueryDef("p10_variant",
    Some("""SELECT cast(json_extract_string(props, '$.k') as int) AS k,
           |       count(*) AS cnt,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events
           |WHERE cast(json_extract_string(props, '$.k') as int) >= 50
           |GROUP BY k ORDER BY k""".stripMargin),
    (s, d) => ev(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .filter(col("k") >= 50)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("k"))

  /** S11: document-store round-trip through the repo's own DataSource V2
    * connector (`graft.sources.docstore.DocStoreSource`) — the real rebuild
    * of the reference's MongoDB hop: `insert_mongo.py:9-15`
    * (`collection.insert_many`) becomes the connector's task-committed
    * write, and `stats_dashboard.py:13-16` (`collection.find({}, {"_id":0})`)
    * becomes a scan whose filter AND projection push INTO the connector
    * (PlanCheck asserts `PushedFilters`/`ReadFields` in the BatchScan):
    * non-matching documents are dropped and absent fields skipped before
    * any row is materialized — `find(filter, projection)` semantics, not
    * scan-everything-then-filter.
    */
  private val s11 = QueryDef("s11_docstore_roundtrip",
    Some("""SELECT event_type, count(*) AS cnt, cast(sum(user_id) as bigint) AS sum_users
           |FROM events WHERE event_type IN ('click','view') AND user_id > 100
           |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s11_docstore_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id")
        .write.format("docstore").mode("overwrite").save(path)
      s.read.format("docstore").load(path)
        .filter(col("event_type").isin("click", "view") && col("user_id") > 100)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).as("sum_users"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): Z-order clustered layout + 2-D pruned scan — the
    * multi-dimensional clustering technique of warehouse table formats
    * ([[graft.operators.Layout]]): events are written to the docstore
    * range-partitioned on the Morton interleave of (user_id, hour), so
    * every shard is a dyadic box in that plane and a 2-D range predicate
    * prunes shards on BOTH columns (a 1-D sort layout prunes on one).
    * The z-value is a codegen'd bit-twiddling Column — no kernel, no UDF.
    * Layout never changes results: the oracle runs the same predicate on
    * the original table; PlanCheck asserts `Shards: kept/total` pruning
    * plus both pushed range predicates.
    */
  private val s13 = QueryDef("s13_zorder_scan",
    Some("""SELECT event_id, user_id, hour(cast(ts as timestamp)) AS hr FROM events
           |WHERE user_id BETWEEN 40 AND 80
           |  AND hour(cast(ts as timestamp)) BETWEEN 6 AND 12
           |ORDER BY event_id""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s13_zorder_${Integer.toHexString(d.hashCode)}"
      graft.operators.Layout.zorderCluster(
        ev(s, d).select(col("event_id"), col("user_id"), hour(col("ts")).as("hr")),
        col("user_id"), col("hr"), nShards = 16)
        .write.format("docstore").mode("overwrite").save(path)
      s.read.format("docstore").load(path)
        .filter(col("user_id").between(40, 80) && col("hr").between(6, 12))
        .select("event_id", "user_id", "hr")
        .orderBy("event_id")
    })

  /** S (rebuild extra): bloom-filtered point lookup — the needle-in-haystack
    * shape zone maps can NEVER serve: events are written hash-scattered on
    * user_id, so every shard's event_id min/max spans essentially the whole
    * domain and min/max pruning keeps all 16 shards. The write opts into
    * per-shard bloom filters on event_id (`option("bloom.fields", ...)` —
    * ~10 bits/value, 7 probes, <1% false-positive keep), and the IN lookup
    * then opens only the ≤3 shards that can hold the keys (PlanCheck
    * asserts `Shards: kept/total` strictly under half). At 100 TB this is
    * the difference between a full-collection scan and reading a handful
    * of shards for an id lookup on a non-clustered column. Layout never
    * changes results: the oracle runs the same IN on the original table.
    */
  private val s14 = QueryDef("s14_bloom_lookup",
    Some("""SELECT event_id, event_type, user_id FROM events
           |WHERE event_id IN (123, 456, 789) ORDER BY event_id""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s14_bloom_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id")
        .repartition(16, col("user_id"))
        .write.format("docstore").mode("overwrite")
        .option("bloom.fields", "event_id").save(path)
      s.read.format("docstore").load(path)
        .filter(col("event_id").isin(123L, 456L, 789L))
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    })

  /** S15: bulk upsert through the document store — MongoDB
    * `ReplaceOne(upsert=True)` bulk-write semantics over the reference's
    * insert path (`insert_mongo.py:9-15` re-run on corrected data): a
    * correction batch REPLACES stored documents by key and a backfill
    * batch INSERTS new keys, in one crash-safe maintenance commit
    * ([[graft.sources.docstore.DocStoreMaintenance.upsert]]). Scale shape:
    * the delta's key set prunes the rewrite to the shards whose zone maps
    * admit an incoming key; the batch stages as new shards through the
    * connector's writer. The oracle recomposes the post-upsert collection
    * relationally: delta ∪ backfill ∪ (base anti-join batch keys).
    */
  private val s15 = QueryDef("s15_docstore_upsert",
    Some("""WITH base AS (SELECT event_id, event_type, user_id, value
           |              FROM events WHERE event_id % 4 != 0),
           |delta AS (SELECT event_id, 'corrected' AS event_type, user_id, value * 2 AS value
           |          FROM events WHERE event_id % 8 = 1),
           |ins AS (SELECT event_id + 10000000 AS event_id, 'backfill' AS event_type,
           |               user_id, value
           |        FROM events WHERE event_id % 8 = 0),
           |finl AS (SELECT * FROM delta UNION ALL SELECT * FROM ins
           |         UNION ALL
           |         SELECT b.* FROM base b
           |         WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.event_id = b.event_id)
           |           AND NOT EXISTS (SELECT 1 FROM ins i WHERE i.event_id = b.event_id))
           |SELECT event_type, count(*) AS cnt, cast(sum(user_id) as bigint) AS sum_users,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM finl GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val path = s"/tmp/graft_s15_upsert_${Integer.toHexString(d.hashCode)}"
      val e = ev(s, d).select("event_id", "event_type", "user_id", "value")
      e.filter(pmod(col("event_id"), lit(4)) =!= 0)
        .write.format("docstore").mode("overwrite").save(path)
      val delta = e.filter(pmod(col("event_id"), lit(8)) === 1)
        .withColumn("event_type", lit("corrected"))
        .withColumn("value", col("value") * 2)
      val ins = e.filter(pmod(col("event_id"), lit(8)) === 0)
        .withColumn("event_id", col("event_id") + lit(10000000L))
        .withColumn("event_type", lit("backfill"))
      graft.sources.docstore.DocStoreMaintenance.upsert(
        s, path, "event_id", delta.unionByName(ins))
      s.read.format("docstore").load(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).as("sum_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  /** S16: GDPR erasure ("right to be forgotten") through the document
    * store — the data-governance operation every production training
    * corpus needs: remove every record of (a) an explicit id list of
    * data subjects and (b) an id range, each as one crash-safe
    * `delete_many` through the connector's zone-map-pruned shard rewrite
    * (the IN list takes the hash-probe evaluator path). The store is
    * clustered on user_id at write, so both erasures rewrite only the
    * shards whose zone maps admit a target id — at 100 TB an erasure
    * request touches a handful of shards, not the collection. The oracle
    * recomposes the surviving collection relationally; equal aggregates
    * prove the erasure removed exactly the subjects' records and nothing
    * else.
    */
  private val s16 = QueryDef("s16_docstore_erasure",
    Some("""SELECT event_type, count(*) AS cnt,
           |  cast(sum(user_id) as bigint) AS sum_users,
           |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events
           |WHERE user_id IS NULL OR (
           |  user_id NOT IN (3, 20, 37, 54, 71, 88, 105, 122, 139)
           |  AND NOT (user_id >= 60 AND user_id < 70))
           |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, In, LessThan}
      val path = s"/tmp/graft_s16_gdpr_${Integer.toHexString(d.hashCode)}"
      ev(s, d).select("event_id", "event_type", "user_id", "value")
        .repartition(16, col("user_id"))
        .write.format("docstore").mode("overwrite").save(path)
      val subjects = Seq(3L, 20L, 37L, 54L, 71L, 88L, 105L, 122L, 139L)
      graft.sources.docstore.DocStoreMaintenance.deleteWhere(
        s, path, Seq(In("user_id", subjects.map(Long.box).toArray)))
      graft.sources.docstore.DocStoreMaintenance.deleteWhere(
        s, path, Seq(GreaterThanOrEqual("user_id", Long.box(60L)),
          LessThan("user_id", Long.box(70L))))
      s.read.format("docstore").load(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("user_id")).as("sum_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  /** S (rebuild extra): bucketed sink + co-located join — the 100 TB
    * technique for repeated joins/aggregations on one key: both sides are
    * written `bucketBy(user_id)`, so the join AND the following aggregate
    * run with ZERO hash exchanges (PlanCheck-asserted). On a cluster this
    * is the difference between re-shuffling the fact table per query and
    * never shuffling it at all.
    */
  private val s7 = QueryDef("s7_bucketed_join",
    Some("""WITH t AS (SELECT user_id, count(*) AS total FROM events GROUP BY user_id)
           |SELECT e.user_id AS user_id, t.total AS total,
           |       cast(sum(cast(e.value as decimal(18,2))) as double) AS sum_value
           |FROM events e JOIN t ON e.user_id = t.user_id
           |GROUP BY 1, 2 ORDER BY user_id""".stripMargin),
    (s, d) => {
      val tag = Integer.toHexString(d.hashCode)
      val evTab = s"graft_bkt_events_$tag"
      val uTab = s"graft_bkt_users_$tag"
      // tmpfs: file create/fsync on this VM's disk costs ms per call and
      // the bucketed write creates 8 files per side
      ev(s, d).select("event_id", "user_id", "value")
        .write.mode("overwrite").option("path", s"/dev/shm/graft_bkt_ev_$tag")
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable(evTab)
      ev(s, d).groupBy("user_id").agg(count(lit(1)).as("total"))
        .write.mode("overwrite").option("path", s"/dev/shm/graft_bkt_u_$tag")
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable(uTab)
      s.table(evTab).join(s.table(uTab), "user_id")
        .groupBy("user_id", "total")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("user_id")
    })

  /** S (rebuild extra): hive-style partitioned layout + partition-pruned
    * scan — THE 100 TB data-layout primitive: a filter on the partition
    * column never touches the other partitions' files at all (directory
    * pruning, before any I/O — stronger than row-group pushdown).
    * PlanCheck asserts the predicate lands in `PartitionFilters`.
    */
  private val s8 = QueryDef("s8_partitioned_scan",
    Some("""SELECT cast(ts as date) AS date, count(*) AS cnt,
           |       cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
           |FROM events WHERE event_type = 'error'
           |GROUP BY date ORDER BY date NULLS FIRST""".stripMargin),
    (s, d) => {
      val tag = Integer.toHexString(d.hashCode)
      val path = s"/dev/shm/graft_part_ev_$tag"
      ev(s, d).select(col("event_id"), col("ts"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path).filter(col("event_type") === "error")
        .groupBy(to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("date")
    })

  // ======================================================================
  // D — dashboard-stage scalar ops (SURVEY §2.3)
  // ======================================================================

  /** D1: null-fill (fillna) — absent extraction → sentinel. */
  private val d1 = QueryDef("d1_null_fill",
    Some(s"""SELECT coalesce($kSql, -1) AS k_filled, count(*) AS cnt
            |FROM events GROUP BY k_filled ORDER BY k_filled""".stripMargin),
    (s, d) => ev(s, d).select(kCol.as("k_filled"))
      .na.fill(-1, Seq("k_filled"))
      .groupBy("k_filled").agg(count(lit(1)).as("cnt"))
      .orderBy("k_filled"))

  /** D3 + S6: drop-null filter (na.drop on the nullable regex-extracted k)
    * feeding a deterministic console sample — the `.show(10)` shape as an
    * ordered LIMIT 10 (Spark plans TakeOrderedAndProject: no full sort, no
    * full scan survives the limit pushdown at scale).
    */
  private val d3 = QueryDef("d3_dropna_sample",
    Some(s"""SELECT event_id, $kSql AS k FROM events
            |WHERE $kSql IS NOT NULL
            |ORDER BY event_id LIMIT 10""".stripMargin),
    (s, d) => ev(s, d).select(col("event_id"), kCol.as("k"))
      .na.drop(Seq("k"))
      .orderBy("event_id").limit(10))

  /** D8: case-fold + set membership (lower(user).isin('root','admin')). */
  private val d8 = QueryDef("d8_casefold_membership",
    Some("""SELECT count(*) FILTER (WHERE lower(upper(event_type)) IN ('error','signup')) AS privileged,
           |       count(*) AS total FROM events""".stripMargin),
    (s, d) => ev(s, d).agg(
      cnt(lower(upper(col("event_type"))).isin("error", "signup")).as("privileged"),
      count(lit(1)).as("total")))

  /** D14/D15: column drop + rename (the per-IP drill-down table,
    * stats_dashboard.py:213 / :77).
    */
  private val d14 = QueryDef("d14_drop_rename",
    Some("""SELECT event_id, cast(ts as timestamp) AS event_time, value AS amount
           |FROM events WHERE user_id = 7 ORDER BY event_time DESC, event_id""".stripMargin),
    (s, d) => ev(s, d)
      .filter(col("user_id") === 7)
      .drop("event_type", "props", "user_id")
      .withColumnRenamed("ts", "event_time")
      .withColumnRenamed("value", "amount")
      .orderBy(desc("event_time"), col("event_id")))

  /** D2/D3: timestamp synthesis from string parts (year-2024 convention). */
  private val d2 = QueryDef("d2_timestamp_synthesis",
    Some("""SELECT cast(strptime('2024 ' || strftime(cast(ts as timestamp), '%b') || ' ' ||
           |         day(cast(ts as timestamp)) || ' ' || strftime(cast(ts as timestamp), '%H:%M:%S'),
           |         '%Y %b %-d %H:%M:%S') AS date) AS date, count(*) AS cnt
           |FROM events GROUP BY date ORDER BY date NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      // null-ts guard: a null timestamp has no string parts — concat_ws
      // SKIPS nulls, so the unguarded synthesis fed the bare "2024" to
      // to_timestamp, an ANSI CANNOT_PARSE_TIMESTAMP crash (degen r11).
      // The row instead lands in the null date group, like the oracle's
      // strptime(NULL) null propagation.
      .select(when(col("ts").isNotNull, to_timestamp(
        concat_ws(" ", lit("2024"), date_format(col("ts"), "MMM"),
          dayofmonth(col("ts")).cast("string"), date_format(col("ts"), "HH:mm:ss")),
        "yyyy MMM d HH:mm:ss")).as("dt"))
      .groupBy(to_date(col("dt")).as("date")).agg(count(lit(1)).as("cnt"))
      .orderBy("date"))

  /** D4/D6: set-membership predicate + binary label map. */
  private val d6 = QueryDef("d6_label_map",
    Some("""SELECT CASE WHEN event_type IN ('error','signup') THEN 'Suspicious' ELSE 'Normal' END AS label,
           |       count(*) AS cnt FROM events GROUP BY label ORDER BY label""".stripMargin),
    (s, d) => ev(s, d)
      .select(when(col("event_type").isin("error", "signup"), "Suspicious")
        .otherwise("Normal").as("label"))
      .groupBy("label").agg(count(lit(1)).as("cnt")).orderBy("label"))

  /** D7/D9/A5/T1: hour-of-day histogram with zero-padded label. */
  private val d7 = QueryDef("d7_hour_histogram",
    Some("""SELECT hour(cast(ts as timestamp)) AS hour,
           |       lpad(cast(hour(cast(ts as timestamp)) as varchar), 2, '0') AS hour_label,
           |       count(*) AS cnt
           |FROM events GROUP BY 1, 2 ORDER BY hour NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("hour"), lpad(col("hour").cast("string"), 2, "0").as("hour_label"), col("cnt"))
      .orderBy("hour"))

  /** D10/A5: daily counts with 'MMM dd' display format. */
  private val d10 = QueryDef("d10_date_format",
    Some("""SELECT cast(ts as date) AS date, strftime(cast(ts as date), '%b %d') AS date_label,
           |       count(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY date NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("date"), date_format(col("date"), "MMM dd").as("date_label"), col("cnt"))
      .orderBy("date"))

  // ======================================================================
  // A — aggregations (SURVEY §2.4)
  // ======================================================================

  /** A1/A2/A3/D11: global metrics in one pass — count, distinct counts,
    * conditional count, guarded percentage.
    */
  private val a1 = QueryDef("a1_global_metrics",
    Some("""SELECT count(*) AS total_records,
           |       count(DISTINCT user_id) AS unique_users,
           |       count(DISTINCT event_type) AS distinct_events,
           |       count(*) FILTER (WHERE event_type IN ('error','signup')) AS failed_events,
           |       floor((count(*) FILTER (WHERE event_type IN ('error','signup'))) * cast(100.0 as double) / count(*) * 100 + 0.5) / 100 AS failed_rate_pct
           |FROM events""".stripMargin),
    (s, d) => ev(s, d).agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("user_id")).as("unique_users"),
      countDistinct(col("event_type")).as("distinct_events"),
      cnt(col("event_type").isin("error", "signup")).as("failed_events"),
      rnd(cnt(col("event_type").isin("error", "signup")) * 100.0 / count(lit(1)), 2)
        .as("failed_rate_pct")))

  /** A4/T2: frequency table (value_counts) ordered by count desc. */
  private val a4 = QueryDef("a4_frequency",
    Some("""SELECT event_type, count(*) AS cnt FROM events
           |GROUP BY event_type ORDER BY cnt DESC, event_type NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("event_type")))

  /** A6: two-key group-by size. */
  private val a6 = QueryDef("a6_two_key_counts",
    Some("""SELECT cast(ts as date) AS date, event_type, count(*) AS cnt
           |FROM events GROUP BY 1, 2 ORDER BY date NULLS FIRST, event_type NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("date", "event_type"))

  /** A7/A8/A12: pivot (long→wide) with explicit value list + row-wise total.
    * The explicit value list avoids Spark's extra distinct-collect job.
    */
  private val a7 = QueryDef("a7_pivot",
    Some("""SELECT user_id,
           |  count(*) FILTER (WHERE event_type = 'click') AS click,
           |  count(*) FILTER (WHERE event_type = 'error') AS error,
           |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
           |  count(*) FILTER (WHERE event_type = 'view') AS view,
           |  count(*) FILTER (WHERE event_type IN ('click','error','purchase','signup','view'))
           |    AS total_events
           |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => {
      val types = EventTypes
      ev(s, d).groupBy("user_id")
        .pivot("event_type", types).count()
        .na.fill(0L, types)
        .withColumn("total_events", types.map(col).reduce(_ + _))
        .orderBy("user_id")
    })

  /** A9/A10/A11: per-group distinct count, sorted collect-set, min/max.
    * The sorted set is emitted `array_join`ed to a comma string: semantics
    * identical, but the checked column is scalar (the driver's comparator
    * can't hash array cells).
    */
  private val a9 = QueryDef("a9_entity_aggregates",
    // types contract (r17, fuzz seed 2026081705): a group whose
    // event_types are ALL NULL has types = '' — the empty rendering of an
    // empty distinct set (pandas ','.join(sorted(set(dropna))) == '').
    // Spark's collect_set already drops nulls to []; DuckDB's list() is a
    // null-skipping AGGREGATE that returns NULL over zero non-null rows,
    // so the oracle needs the explicit coalesce (same guard j1's error_ks
    // and a17's map already carry).
    Some(s"""SELECT user_id,
            |  count(DISTINCT $kSql) AS distinct_ks,
            |  coalesce(array_to_string(list_sort(list_distinct(list(event_type))), ','), '') AS types,
            |  cast(min(ts) as timestamp) AS first_seen,
            |  cast(max(ts) as timestamp) AS last_seen
            |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d).groupBy("user_id").agg(
      countDistinct(kCol).as("distinct_ks"),
      array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
      min(col("ts")).as("first_seen"),
      max(col("ts")).as("last_seen"))
      .orderBy("user_id"))

  /** A13: filtered group-count. */
  private val a13 = QueryDef("a13_filtered_group_count",
    Some("""SELECT user_id, count(*) AS error_cnt FROM events
           |WHERE event_type = 'error' GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d).filter(col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("error_cnt"))
      .orderBy("user_id"))

  /** A14: scalar stats — count/max/avg; avg via exact decimal sum ÷ count. */
  private val a14 = QueryDef("a14_scalar_stats",
    Some("""SELECT count(*) AS n, max(value) AS max_value,
           |       cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS avg_value
           |FROM events""".stripMargin),
    (s, d) => ev(s, d).agg(
      count(lit(1)).as("n"),
      max(col("value")).as("max_value"),
      (sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_value")))

  /** A16 (rebuild extra): exact per-group top-k via a custom Aggregator —
    * constant-size (k) partial buffers merged map-side; the window
    * formulation would shuffle every row of every key.
    */
  private val a16 = QueryDef("a16_topk_agg",
    // value IS NOT NULL on both sides: the primitive-Double Aggregator
    // would decode a NULL as 0.0 into the top-k while the oracle's DESC
    // ranking shuffles nulls to the tail — neither is a sane "top value"
    Some("""WITH ranked AS (
           |  SELECT user_id, value,
           |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn
           |  FROM events WHERE value IS NOT NULL)
           |SELECT user_id,
           |       array_to_string(list(cast(cast(value as decimal(18,2)) as varchar)
           |                            ORDER BY value DESC), ',') AS top_values
           |FROM ranked WHERE rn <= 3 GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d).filter(col("value").isNotNull).groupBy("user_id")
      .agg(array_join(
        transform(graft.functions.TopKAgg.topKValues(col("value"), 3),
          x => x.cast("decimal(18,2)").cast("string")),
        ",").as("top_values"))
      .orderBy("user_id"))

  /** A17 (rebuild extra): MapType column — per-user event_type→count as ONE
    * map column (the dict-valued column shape the reference's pandas rows
    * carry implicitly). The map is built in-plan (collect_list of entry
    * structs, sorted for determinism, map_from_entries); the checked value
    * is its canonical JSON rendering, which DuckDB re-derives with an
    * ordered string_agg.
    */
  private val a17 = QueryDef("a17_map_column",
    // NULL event_type is EXCLUDED from the map on both engines: a map
    // cannot carry a null key (Spark's map_from_entries throws
    // NULL_MAP_KEY outright — the degen gate's r11 find), and DuckDB's
    // string_agg skips the null-keyed entry natively. A user whose every
    // event has a null type still emits its row with the empty map "{}"
    // (collect_list skips null whens / coalesce('') on the oracle side).
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           |           FROM events GROUP BY 1, 2)
           |SELECT user_id,
           |       '{' || coalesce(string_agg('"' || event_type || '":' || cnt, ',' ORDER BY event_type), '') || '}' AS type_counts
           |FROM c GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(to_json(map_from_entries(
        sort_array(collect_list(when(col("event_type").isNotNull,
          struct(col("event_type"), col("cnt"))))))).as("type_counts"))
      .orderBy("user_id"))

  /** A15: fixed-width bucket histogram. */
  private val a15 = QueryDef("a15_histogram",
    Some("""SELECT cast(floor(value / 20) as bigint) AS bucket, count(*) AS cnt
           |FROM events GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(floor(col("value") / 20).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket"))

  // ======================================================================
  // J — joins (SURVEY §2.5) — events-domain grafts + TPC-H-style shapes
  // ======================================================================

  /** J1: aggregate-graft left join with null-fill (the reference's
    * index.map pattern). Right side is a small aggregate → broadcast-hash.
    */
  private val j1 = QueryDef("j1_graft_left_join",
    Some(s"""WITH base AS (SELECT user_id, count(*) AS total FROM events GROUP BY user_id),
            |susp AS (SELECT user_id,
            |           array_to_string(list_sort(list_distinct(list(cast($kSql as varchar)))), ',') AS error_ks
            |         FROM events WHERE event_type = 'error' GROUP BY user_id)
            |SELECT b.user_id AS user_id, b.total AS total,
            |       coalesce(s.error_ks, '') AS error_ks
            |FROM base b LEFT JOIN susp s ON b.user_id = s.user_id
            |ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => {
      val base = ev(s, d).groupBy("user_id").agg(count(lit(1)).as("total"))
      val susp = ev(s, d).filter(col("event_type") === "error")
        .groupBy("user_id")
        .agg(array_join(sort_array(collect_set(kCol.cast("string"))), ",").as("error_ks"))
      base.join(broadcast(susp), Seq("user_id"), "left")
        .withColumn("error_ks", coalesce(col("error_ks"), lit("")))
        .orderBy("user_id")
    })

  /** J4: left-semi join (customers having orders). */
  private val j4 = QueryDef("j4_semi_join",
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) => Tables.customer(s, d).as("c")
      .join(Tables.orders(s, d).as("o"), col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey"))

  /** J5: left-anti join (customers with no orders). */
  private val j5 = QueryDef("j5_anti_join",
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) => Tables.customer(s, d).as("c")
      .join(Tables.orders(s, d).as("o"), col("c.c_custkey") === col("o.o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey"))

  /** J6: 5-table star join — revenue per nation in EUROPE. Dimensions are
    * broadcast; only the lineitem↔orders join shuffles. Revenue summed in
    * exact decimal then cast to double.
    */
  private val j6 = QueryDef("j6_star_join_revenue",
    Some("""SELECT n_name,
           |  cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'EUROPE'
           |GROUP BY n_name ORDER BY n_name""".stripMargin),
    (s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .groupBy("n_name")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    })

  /** J7: broadcast join against a small dimension. */
  private val j7 = QueryDef("j7_broadcast_join",
    Some("""SELECT p_brand,
           |  cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    })

  /** J8 (rebuild extra): as-of join — for each purchase, the most recent
    * click of the same user at-or-before its timestamp. Sort-merge
    * formulation via [[graft.operators.TemporalJoins.asOfJoin]]: one
    * shuffle+sort, no range probe.
    */
  private val j8 = QueryDef("j8_asof_join",
    // null-ts alignment mirrors the operator (TemporalJoins.asOfJoin): a
    // null-ts CLICK is "as of" nothing and is filtered from the right
    // side; a null-ts PURCHASE sorts FIRST (Spark window asc) with no
    // preceding click, so its asof columns are NULL — the window order is
    // pinned NULLS FIRST to reproduce that.
    Some("""WITH u AS (
           |  SELECT user_id, cast(ts as timestamp) AS ts, event_id, value,
           |         (event_type = 'click') AS is_c
           |  FROM events WHERE event_type IN ('click','purchase')
           |    AND NOT (event_type = 'click' AND ts IS NULL)),
           |marked AS (
           |  SELECT *, last_value(CASE WHEN is_c THEN struct_pack(cts := ts, ceid := event_id, cval := value) END IGNORE NULLS)
           |    OVER (PARTITION BY user_id
           |          ORDER BY ts NULLS FIRST, is_c DESC,
           |                   CASE WHEN is_c THEN event_id ELSE 9223372036854775807 END
           |          ROWS UNBOUNDED PRECEDING) AS lastc
           |  FROM u)
           |SELECT event_id, user_id, ts, value,
           |       lastc.cts AS click_ts, lastc.ceid AS click_event_id, lastc.cval AS click_value
           |FROM marked WHERE NOT is_c ORDER BY event_id""".stripMargin),
    (s, d) => {
      val base = ev(s, d)
      val clicks = base.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      val purchases = base.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.TemporalJoins
        .asOfJoin(purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("asof.ts").as("click_ts"), col("asof.event_id").as("click_event_id"),
          col("asof.value").as("click_value"))
        .orderBy("event_id")
    })

  /** J9 (rebuild extra): range join — per purchase, how many clicks of the
    * same user in the preceding hour. Binned equi-join rewrite via
    * [[graft.operators.TemporalJoins.rangeJoinCount]] (2 candidate bins
    * per build row — bounded fan-out; Spark's native plan would be a
    * nested loop).
    */
  private val j9 = QueryDef("j9_range_join",
    Some("""WITH c AS (SELECT user_id, epoch_us(cast(ts as timestamp)) AS cus
           |           FROM events WHERE event_type = 'click'),
           |p AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts,
           |             epoch_us(cast(ts as timestamp)) AS pus
           |      FROM events WHERE event_type = 'purchase')
           |SELECT p.event_id, p.user_id, p.ts, count(c.cus) AS window_count
           |FROM p LEFT JOIN c
           |  ON c.user_id = p.user_id AND c.cus >= p.pus - 3600000000 AND c.cus < p.pus
           |GROUP BY p.event_id, p.user_id, p.ts
           |ORDER BY p.event_id""".stripMargin),
    (s, d) => {
      val base = ev(s, d)
      val clicks = base.filter(col("event_type") === "click").select("user_id", "ts")
      val purchases = base.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.operators.TemporalJoins
        .rangeJoinCount(purchases, clicks, "user_id", "ts", "ts", "event_id", 3600000000L)
        .select("event_id", "user_id", "ts", "window_count")
        .orderBy("event_id")
    })

  /** J10 (rebuild extra): correlated EXISTS / NOT EXISTS subqueries — the
    * SQL-surface twin of j4/j5's DataFrame semi/anti joins. Catalyst
    * DECORRELATES both subqueries into one semi and one anti join against
    * orders (no per-row re-execution, no nested loop) — the plan shape a
    * 100 TB subquery depends on, PlanCheck-asserted.
    */
  private val j10 = QueryDef("j10_exists_subquery",
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
           |  AND NOT EXISTS (SELECT 1 FROM orders o2
           |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
           |ORDER BY c_custkey""".stripMargin),
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("j10_customer")
      Tables.orders(s, d).createOrReplaceTempView("j10_orders")
      s.sql("""SELECT c_custkey, c_name FROM j10_customer c
              |WHERE EXISTS (SELECT 1 FROM j10_orders o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
              |  AND NOT EXISTS (SELECT 1 FROM j10_orders o2
              |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
              |ORDER BY c_custkey""".stripMargin)
    })

  /** J11 (rebuild extra): salted skew join — events' 5-value event_type is
    * the canonical hot-key shape: a plain shuffle join would put each
    * type's rows in ONE task. [[graft.operators.SkewJoins.saltedJoin]]
    * spreads every key over 16 salt buckets (deterministic salt from the
    * row id, small side exploded 16×). The merge hint forces the shuffle
    * path the technique exists for — with a broadcastable 5-row dim Spark
    * would otherwise broadcast and no skew could arise.
    */
  private val j11 = QueryDef("j11_salted_skew_join",
    Some("""WITH dim AS (SELECT * FROM (VALUES
           |    ('click', cast(0.0 as double)), ('error', cast(0.5 as double)),
           |    ('purchase', cast(0.1 as double)), ('signup', cast(0.2 as double)),
           |    ('view', cast(0.0 as double))) AS t(event_type, risk))
           |SELECT e.event_type AS event_type, d.risk AS risk, count(*) AS cnt,
           |       cast(sum(cast(e.value as decimal(18,2))) as double) AS sum_value
           |FROM events e JOIN dim d ON e.event_type = d.event_type
           |GROUP BY 1, 2 ORDER BY event_type""".stripMargin),
    (s, d) => {
      val dim = s.createDataFrame(Seq(
        ("click", 0.0), ("error", 0.5), ("purchase", 0.1), ("signup", 0.2), ("view", 0.0)))
        .toDF("event_type", "risk")
      graft.operators.SkewJoins
        .saltedJoin(ev(s, d), dim.hint("merge"), "event_type",
          buckets = 16, saltSource = xxhash64(col("event_id")))
        .groupBy("event_type", "risk")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    })

  // ======================================================================
  // The flagship: one-pass per-entity summary with score + classification
  // (D12/D13/A9-A13/J2 — the reference's 8-pass per-IP build, in ONE pass)
  // ======================================================================

  /** Shared DuckDB CTE chain for the suspicion-scoring pipeline. The score
    * weights live in exactly TWO places — [[entitySummary]] (Spark) and
    * here (oracle); both j2_entity_summary and j2_profile_struct
    * interpolate this constant, so a tuning change cannot drift the two
    * oracles apart.
    */
  private val suspicionCtes =
    s"""WITH agg AS (
       |  SELECT user_id,
       |    count(*) AS total_events,
       |    count(*) FILTER (WHERE event_type IN ('error','signup')) AS failed_events,
       |    count(DISTINCT $kSql) AS distinct_ks,
       |    count(*) FILTER (WHERE $kSql >= 90) AS root_attempts,
       |    count(DISTINCT event_type) AS diversity,
       |    cast(min(ts) as timestamp) AS first_seen,
       |    cast(max(ts) as timestamp) AS last_seen
       |  FROM events GROUP BY user_id),
       |scored AS (
       |  SELECT *, least(cast(100.0 as double),
       |    cast(2.0 as double) * failed_events + cast(0.3 as double) * distinct_ks
       |    + cast(0.05 as double) * total_events
       |    + cast(15.0 as double) * (CASE WHEN root_attempts > 0 THEN 1 ELSE 0 END)
       |    + cast(1.0 as double) * diversity) AS suspicious_score
       |  FROM agg),
       |profiled AS (
       |  SELECT *,
       |    least(cast(100.0 as double), cast(0.6 as double) * suspicious_score
       |      + cast(5.0 as double) * root_attempts + cast(2.0 as double) * failed_events) AS att,
       |    least(cast(100.0 as double), cast(1.5 as double) * diversity
       |      + cast(0.6 as double) * distinct_ks) AS bot
       |  FROM scored),
       |legitd AS (
       |  SELECT *, greatest(cast(0.0 as double), cast(100.0 as double) - att - bot) AS legit
       |  FROM profiled)""".stripMargin

  private val j2 = QueryDef("j2_entity_summary",
    Some(s"""$suspicionCtes
            |SELECT user_id, total_events, failed_events, distinct_ks, root_attempts, diversity,
            |  first_seen, last_seen, suspicious_score,
            |  floor(att * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 AS attacker_pct,
            |  floor(bot * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 AS bot_pct,
            |  floor(legit * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 AS authorized_pct
            |FROM legitd ORDER BY suspicious_score DESC, user_id NULLS FIRST""".stripMargin),
    (s, d) => entitySummary(ev(s, d)))

  /** The one-pass summary used by j2/j3 and `SparkEntry.entry`. */
  def entitySummary(events: DataFrame): DataFrame = {
    val failed = cnt(col("event_type").isin("error", "signup"))
    val base = events.groupBy("user_id").agg(
      count(lit(1)).as("total_events"),
      failed.as("failed_events"),
      countDistinct(kCol).as("distinct_ks"),
      cnt(kCol >= 90).as("root_attempts"),
      countDistinct(col("event_type")).as("diversity"),
      min(col("ts")).as("first_seen"),
      max(col("ts")).as("last_seen"))
    val scored = base.withColumn("suspicious_score",
      least(lit(100.0),
        lit(2.0) * col("failed_events") + lit(0.3) * col("distinct_ks") +
          lit(0.05) * col("total_events") +
          lit(15.0) * (col("root_attempts") > 0).cast("int") + lit(1.0) * col("diversity")))
    val att = least(lit(100.0),
      lit(0.6) * col("suspicious_score") + lit(5.0) * col("root_attempts") +
        lit(2.0) * col("failed_events"))
    val bot = least(lit(100.0), lit(1.5) * col("diversity") + lit(0.6) * col("distinct_ks"))
    val withAb = scored.withColumn("att", att).withColumn("bot", bot)
    val legit = greatest(lit(0.0), lit(100.0) - col("att") - col("bot"))
    val total = col("att") + col("bot") + legit
    withAb
      .withColumn("attacker_pct", rnd(col("att") * 100.0 / total, 1))
      .withColumn("bot_pct", rnd(col("bot") * 100.0 / total, 1))
      .withColumn("authorized_pct", rnd(legit * 100.0 / total, 1))
      .drop("att", "bot")
      .orderBy(desc("suspicious_score"), col("user_id"))
  }

  /** The reference's `ip_type_profile` shape (stats_dashboard.py:137-143
    * returns a 3-key dict per row): the classification percentages as ONE
    * StructType column. The struct is built and carried through the plan;
    * the checked value is its canonical JSON rendering (the driver's
    * comparator needs a scalar cell), with fields cast to decimal(18,1) so
    * both engines print identical fixed-scale numbers.
    */
  private val j2ps = QueryDef("j2_profile_struct",
    Some(s"""$suspicionCtes
            |SELECT user_id, to_json(struct_pack(
            |  attacker := cast(floor(att * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 as decimal(18,1)),
            |  bot := cast(floor(bot * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 as decimal(18,1)),
            |  authorized := cast(floor(legit * cast(100.0 as double) / (att + bot + legit) * 10 + 0.5) / 10 as decimal(18,1)))) AS profile
            |FROM legitd ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => entitySummary(ev(s, d))
      .select(col("user_id"),
        to_json(struct(
          col("attacker_pct").cast("decimal(18,1)").as("attacker"),
          col("bot_pct").cast("decimal(18,1)").as("bot"),
          col("authorized_pct").cast("decimal(18,1)").as("authorized"))).as("profile"))
      .orderBy("user_id"))

  /** J3: parameterized point lookup — the filter pushes into the scan. */
  private val j3 = QueryDef("j3_point_lookup",
    Some("""SELECT user_id, count(*) AS total, cast(min(ts) as timestamp) AS first_seen
           |FROM events WHERE user_id = 7 GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d).filter(col("user_id") === 7)
      .groupBy("user_id")
      .agg(count(lit(1)).as("total"), min(col("ts")).as("first_seen"))
      .orderBy("user_id"))

  // ======================================================================
  // T/W — sorts, top-k, windows (SURVEY §2.6, §2.7)
  // ======================================================================

  /** A (rebuild extra): approximate percentiles — the mergeable-sketch
    * answer to quantiles at 100 TB. w5's exact `percentile` buffers every
    * group's values; `approx_percentile` (Greenwald-Khanna) folds each
    * partition into a bounded sketch that merges map-side, so shuffle
    * volume is (groups × sketch), independent of row count. Exact values
    * sit alongside for self-documenting error. Output is one
    * row per (event_type, percentile) with scalar doubles: the r6 shape
    * returned the percentile ARRAYS, which the driver's pandas comparer
    * cannot sort (unhashable ndarray) — even the rows-only check errored.
    *
    * HASH-CHECKED via a bounded-property oracle (r11): the raw GK values
    * are engine-private and merge-order-dependent, so the REGISTERED
    * output ([[a19]]) carries the exact quantiles plus `approx_ok` — an
    * in-query assertion that each sketch value's RANK interval (from the
    * value histogram: GK returns real data values, so every estimate has
    * an exact histogram row) intersects the target rank within the GK
    * guarantee ε + 2/n (ε = 1/accuracy = 1e-4; the same contract
    * TrainingPrepSpec asserts on this raw frame). The oracle replays the
    * exact side (quantile_cont — bit-identical interpolation, see w5) and
    * pins the verdict TRUE, so a broken sketch is a driver-visible hash
    * mismatch rather than a `no_oracle` null row.
    */
  private[graft] def a19Raw(s: SparkSession, d: String): DataFrame = {
      val approx = ev(s, d).groupBy("event_type").agg(
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("aq"))
      // Exact reference values via the bounded per-(type, cent-value)
      // histogram (the w5 shape) — NOT `percentile()`, which buffers the
      // whole group's values in one task (the 100×-unsafe shape the w5/w7
      // rewrite removed in round 8; this was the last surviving instance).
      // Shuffle here is bounded by the value domain, not the row count,
      // and the interpolation expression matches `percentile` bit-for-bit
      // (see w5's scaladoc). n = count of non-null values — the count the
      // quantiles are actually over.
      val cum = valueHistogram(ev(s, d))
      def vAt(idx: Column): Column = min(when(col("cum") >= idx + 1, col("value")))
      def h(p: Double): Column = lit(p) * (col("n").cast("double") - 1.0)
      val agged = cum.groupBy("event_type").agg(
        max("n").as("n"),
        vAt(floor(h(0.5))).as("lo50"), vAt(ceil(h(0.5))).as("hi50"),
        vAt(floor(h(0.9))).as("lo90"), vAt(ceil(h(0.9))).as("hi90"),
        vAt(floor(h(0.99))).as("lo99"), vAt(ceil(h(0.99))).as("hi99"))
      def interp(p: Double, lo: Column, hi: Column): Column = {
        val hh = lit(p) * (col("n").cast("double") - 1.0)
        val dd = hh - floor(hh).cast("double")
        lo * (lit(1.0) - dd) + hi * dd
      }
      val exact = agged.select(col("event_type"), col("n"),
        array(interp(0.5, col("lo50"), col("hi50")),
          interp(0.9, col("lo90"), col("hi90")),
          interp(0.99, col("lo99"), col("hi99"))).as("eq"))
      // LEFT join + coalesced arrays: an event_type whose values are ALL
      // NULL has no histogram row (valueHistogram filters value IS NOT
      // NULL) and a NULL approx_percentile result — it must still emit its
      // 3 (p, null, null) rows with n=0 rather than silently vanish
      // (posexplode of a null zip yields no rows). `n` is the NON-NULL
      // value count — the population the quantiles are actually over —
      // not the group's row count.
      val nullTriple = array(Seq.fill(3)(lit(null).cast("double")): _*)
      // NULL-SAFE key: a NULL event_type group exists on BOTH sides when
      // such rows carry non-null values — equi-join semantics would leave
      // its exact arm unmatched (n=0 beside real quantiles)
      approx.join(broadcast(exact.withColumnRenamed("event_type", "et")),
          col("event_type") <=> col("et"), "left").drop("et")
        .select(col("event_type"),
          coalesce(col("aq"), nullTriple).as("aq"),
          coalesce(col("eq"), nullTriple).as("eq"),
          coalesce(col("n"), lit(0L)).as("n"))
        .select(col("event_type"),
          posexplode(arrays_zip(col("aq"), col("eq"))).as(Seq("pos", "z")),
          col("n"))
        .select(col("event_type"),
          element_at(array(lit(0.5), lit(0.9), lit(0.99)), col("pos") + 1).as("p"),
          col("z.aq").as("approx_v"), col("z.eq").as("exact_v"), col("n"))
        .orderBy("event_type", "p")
  }

  private val a19 = QueryDef("a19_approx_quantiles",
    Some("""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
           |g AS (SELECT event_type,
           |        quantile_cont(value, 0.5) AS q50,
           |        quantile_cont(value, 0.9) AS q90,
           |        quantile_cont(value, 0.99) AS q99,
           |        count(*) AS n
           |      FROM e GROUP BY event_type),
           |base AS (SELECT DISTINCT event_type FROM events),
           |ps AS (SELECT cast(p AS double) AS p FROM (VALUES (0.5), (0.9), (0.99)) t(p))
           |SELECT b.event_type, ps.p,
           |       CASE ps.p WHEN 0.5 THEN g.q50 WHEN 0.9 THEN g.q90 ELSE g.q99 END AS exact_v,
           |       coalesce(g.n, 0) AS n,
           |       TRUE AS approx_ok
           |FROM base b CROSS JOIN ps
           |LEFT JOIN g ON b.event_type IS NOT DISTINCT FROM g.event_type
           |ORDER BY b.event_type NULLS FIRST, ps.p""".stripMargin),
    (s, d) => {
      val raw = a19Raw(s, d)
      // rank adjudication: GK returns REAL data values, so each non-null
      // estimate joins to exactly one histogram row; its rank interval is
      // [(cum − cnt)/n, cum/n]. The histogram broadcasts: its size is the
      // distinct (event_type, cent-value) domain (~49k rows at sf0.1,
      // saturating as the value domain fills — not row-count-bound), and
      // raw is 3×#groups rows, so the left join is broadcast-build-right.
      val h = valueHistogram(ev(s, d)).select(col("event_type").as("het"),
        col("value").as("hv"), col("cnt").as("hcnt"), col("cum").as("hcum"))
      val tol = lit(1.0 / 10000) + lit(2.0) / col("n").cast("double")
      val ok = when(col("n") === 0L, col("approx_v").isNull).otherwise(
        ((col("hcum") - col("hcnt")).cast("double") / col("n") - col("p") <= tol) &&
          (col("p") - col("hcum").cast("double") / col("n") <= tol))
      raw
        .join(broadcast(h),
          col("event_type") <=> col("het") && col("approx_v") === col("hv"), "left")
        .select(col("event_type"), col("p"), col("exact_v"), col("n"),
          coalesce(ok, lit(false)).as("approx_ok"))
        .orderBy("event_type", "p")
    })

  /** HASH-CHECKED approximate quantiles — the deterministic complement of
    * a19's `approx_percentile` (whose KLL/GK sketch state is
    * engine-private and merge-order-dependent): a fixed-B equi-width
    * value histogram with within-bucket linear interpolation. Two bounded
    * passes — per-group min/max/n (broadcast back), then a histogram
    * whose shuffle is ≤ B=256 rows per group regardless of data size —
    * and a ≤256-row window per group for the cumulative rank walk.
    * Deterministic: bucket index, target rank ceil(q·n), and the
    * interpolation are pure double arithmetic replayed operation-for-
    * operation by the oracle (Spark's floor/ceil return LONG where
    * DuckDB's return DOUBLE — both sides cast to double explicitly so
    * the coerced values are identical exact integers). Error bound:
    * |est − true| ≤ (mx−mn)/B per quantile, asserted in KmvErrorSpec.
    */
  private val a19b = QueryDef("a19b_histogram_quantiles",
    Some("""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
           |st AS (
           |  SELECT event_type, min(value) AS mn, max(value) AS mx, count(*) AS n
           |  FROM e GROUP BY event_type),
           |hist AS (
           |  SELECT e.event_type, st.mn, st.mx, st.n,
           |    CASE WHEN st.mx > st.mn THEN
           |      cast(least(floor((e.value - st.mn) / ((st.mx - st.mn) / 256.0)), 255.0) AS int)
           |    ELSE 0 END AS idx,
           |    count(*) AS cnt
           |  FROM e JOIN st USING (event_type)
           |  GROUP BY 1, 2, 3, 4, 5),
           |cum AS (
           |  SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY idx) AS cm
           |  FROM hist),
           |q AS (SELECT unnest([cast(0.5 AS double), cast(0.9 AS double),
           |                     cast(0.99 AS double)]) AS p),
           |sel AS (
           |  SELECT c.event_type, q.p, c.mn, c.mx, c.idx, c.cnt, c.n,
           |    cast(c.cm - c.cnt AS double) AS cb, cast(c.cm AS double) AS cmd,
           |    cast(ceil(q.p * c.n) AS double) AS target
           |  FROM cum c CROSS JOIN q)
           |SELECT event_type, p,
           |  CASE WHEN mx > mn THEN
           |    mn + ((mx - mn) / 256.0) *
           |      (cast(idx AS double) + (target - cb) / cast(cnt AS double))
           |  ELSE mn END AS approx_v,
           |  n
           |FROM sel WHERE target > cb AND target <= cmd
           |ORDER BY event_type, p""".stripMargin),
    (s, d) => {
      val e = ev(s, d).filter(col("value").isNotNull).select("event_type", "value")
      val stats = e.groupBy("event_type").agg(
        min("value").as("mn"), max("value").as("mx"), count(lit(1)).as("n"))
      val wCol = (col("mx") - col("mn")) / lit(256.0)
      val hist = e.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("mn"), col("mx"), col("n"),
          when(col("mx") > col("mn"),
            least(floor((col("value") - col("mn")) / wCol).cast("double"), lit(255.0)))
            .otherwise(lit(0.0)).cast("int").as("idx"))
        .groupBy("event_type", "mn", "mx", "n", "idx").agg(count(lit(1)).as("cnt"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("idx")
      hist.withColumn("cm", sum("cnt").over(wCum))
        .withColumn("cb", (col("cm") - col("cnt")).cast("double"))
        .select(col("*"),
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
        .withColumn("target", ceil(col("p") * col("n")).cast("double"))
        .filter(col("target") > col("cb") && col("target") <= col("cm").cast("double"))
        .select(col("event_type"), col("p"),
          when(col("mx") > col("mn"),
            col("mn") + wCol *
              (col("idx").cast("double") +
                (col("target") - col("cb")) / col("cnt").cast("double")))
            .otherwise(col("mn")).as("approx_v"),
          col("n"))
        .orderBy("event_type", "p")
    })

  /** A (rebuild extra): heavy hitters via Misra-Gries sketch + exact
    * verification — the production two-pass shape for "which keys exceed
    * x% of traffic" at 100 TB: pass 1 reduces the stream to ≤k candidate
    * counters per partition (constant shuffle regardless of key
    * cardinality — an exact groupBy would shuffle every distinct key),
    * pass 2 exactly counts ONLY the ≤k candidates (broadcast semi-join
    * probe) and keeps those with true share > 1/k. MG's no-false-negative
    * guarantee makes the result EXACT — the oracle computes plain
    * GROUP BY + HAVING and must hash-match, which verifies the guarantee
    * end-to-end on real data. Key = log-scale user bucket
    * (`length(bin(user_id+1)) - 1`) — integer-exact on both engines, and
    * Zipf-ish by construction so hitters exist at every SF.
    *
    * NULL keys (null user_id) are excluded from HITTER candidacy by the
    * same contract the streaming twin documents at `heavyHitterStream`:
    * an unattributed pseudo-key isn't a reportable hitter, but its rows
    * still count toward n and dilute every share (the oracle's WHERE
    * key IS NOT NULL sits on the hitter filter, not on e). The Spark
    * side can never emit one mechanically — the exact-verify equi-join
    * drops null keys — and the r14 fuzz gate proved the oracle COULD
    * once the null group grew past n/8, which is why the exclusion is
    * now explicit.
    */
  private val a21 = QueryDef("a21_heavy_hitters",
    Some("""WITH e AS (SELECT cast(length(bin(user_id + 1)) - 1 AS bigint) AS key FROM events),
           |n AS (SELECT count(*) AS n FROM e),
           |c AS (SELECT key, count(*) AS cnt FROM e GROUP BY key)
           |SELECT key, cnt, floor(cnt * cast(1.0 as double) / n * 10000 + 0.5) / 10000 AS share
           |FROM c, n WHERE key IS NOT NULL AND cnt * 8 > n ORDER BY cnt DESC, key""".stripMargin),
    (s, d) => {
      val k = 8
      val key = (length(expr("bin(user_id + 1)")) - 1).cast("long").as("key")
      val keys = ev(s, d).select(key)
      // the global total rides the sketch pass (ONE aggregation — a
      // separate keys.agg(count) branch would re-scan events a third time)
      // and reaches the verify pass as a column of the broadcast k rows
      val cand = keys
        .agg(graft.functions.TopKAgg.misraGries(col("key"), k).as("mg"),
          count(lit(1)).as("n"))
        .select(explode(col("mg")).as("c"), col("n"))
        .select(col("c._1").as("key"), col("n"))
      keys.join(broadcast(cand), "key")
        .groupBy("key").agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
        .filter(col("cnt") * k > col("n"))
        .select(col("key"), col("cnt"),
          graft.functions.Rounding.round4(col("cnt") * lit(1.0) / col("n")).as("share"))
        .orderBy(desc("cnt"), col("key"))
    })

  /** A22 (rebuild extra): weekly cohort retention — the classic
    * product-analytics matrix: users bucketed by first-seen ISO week
    * ("cohort"), tracked by how many are active again N weeks later, with
    * retention as a share of the cohort's week-0 size.
    *
    * Scale shape: ONE user_id shuffle total. Per user we reduce map-side to
    * the distinct SET of active weeks (bounded by the calendar span — ~5
    * weeks here, never |events| — so collect_set state is tiny and the
    * partial agg crushes the event volume before the exchange), take its
    * min as the cohort, explode, and aggregate (cohort, offset) cells by
    * counting ROWS — each row is already one distinct user per cell, so the
    * usual countDistinct(user_id) formulation (a SECOND user_id-wide
    * shuffle with per-cell distinct state) is unnecessary. The final cells
    * table is |weeks|² rows; the cohort-size window runs on that, not on
    * events. Both week-truncations are Monday-start (ISO) in Spark and
    * DuckDB, and offsets are exact multiples of 7 days, so the /7 division
    * is integral on both engines.
    */
  private val a22 = QueryDef("a22_cohort_retention",
    Some("""WITH uw AS (
           |  SELECT DISTINCT user_id, cast(date_trunc('week', ts) as date) AS wk
           |  FROM events WHERE ts IS NOT NULL),
           |fc AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1),
           |cells AS (
           |  SELECT fc.cohort_week,
           |         cast(datediff('day', fc.cohort_week, uw.wk) / 7 as bigint) AS week_offset,
           |         count(*) AS n_users
           |  FROM uw JOIN fc ON uw.user_id IS NOT DISTINCT FROM fc.user_id
           |  GROUP BY 1, 2)
           |SELECT cohort_week, week_offset, n_users,
           |  floor(cast(n_users as double) /
           |        max(CASE WHEN week_offset = 0 THEN n_users END)
           |          OVER (PARTITION BY cohort_week) * 10000 + 0.5) / 10000 AS retention_pct
           |FROM cells ORDER BY cohort_week, week_offset""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wk = date_trunc("week", col("ts")).cast("date")
      val cells = ev(s, d)
        .groupBy("user_id")
        .agg(collect_set(wk).as("weeks"))
        .select(array_min(col("weeks")).as("cohort_week"), explode(col("weeks")).as("wk"))
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
      cells.select(col("cohort_week"), col("week_offset"), col("n_users"),
          rnd(col("n_users").cast("double") /
            max(when(col("week_offset") === 0, col("n_users")))
              .over(Window.partitionBy("cohort_week")), 4).as("retention_pct"))
        .orderBy("cohort_week", "week_offset")
    })

  /** A23 (rebuild extra): distribution drift as Population Stability Index
    * — the standard training-data / feature-monitoring statistic: bin the
    * metric into 10 fixed-width buckets, compare the baseline period's
    * share per bin (first half of the month) against the current period's
    * (second half), PSI = Σ_bins (p−q)·ln(p/q). Laplace-smoothed
    * ((n+1)/(N+10)) so an empty bin on one side stays finite.
    *
    * Scale shape: one scan, one partial-aggregated shuffle of ≤ 10 groups
    * (both period counts ride the SAME groupBy as conditional counts — two
    * passes or a period-keyed shuffle would be wrong); the window totals
    * and PSI arithmetic run on the 10-row result. Cross-engine: shares are
    * exact integer divisions (IEEE-identical); each bin's PSI term carries
    * an ln(), so it is floored to an integer at 1e-4 BEFORE the total sum
    * (the bm25/tfidf convention) — integer sums are order-proof where a
    * double Σ of ln()s is not.
    */
  private val a23 = QueryDef("a23_psi_drift",
    Some("""WITH b AS (
           |  SELECT cast(least(floor(value / 50), 9) as int) AS bin,
           |         date_part('day', ts) <= 15 AS is_base
           |  FROM events),
           |c AS (SELECT bin,
           |        count(*) FILTER (is_base) AS base_n,
           |        count(*) FILTER (NOT is_base) AS cur_n
           |      FROM b GROUP BY 1),
           |t AS (SELECT *, cast(sum(base_n) OVER () as bigint) AS base_tot,
           |               cast(sum(cur_n) OVER () as bigint) AS cur_tot FROM c),
           |sh AS (SELECT bin, base_n, cur_n,
           |         (cast(base_n as double) + 1) / (cast(base_tot as double) + 10) AS base_share,
           |         (cast(cur_n as double) + 1) / (cast(cur_tot as double) + 10) AS cur_share
           |       FROM t),
           |i AS (SELECT *, cast(floor((base_share - cur_share) * ln(base_share / cur_share)
           |                           * 10000 + 0.5) as bigint) AS ci
           |      FROM sh)
           |SELECT bin, base_n, cur_n, base_share, cur_share,
           |       cast(ci as double) / 10000 AS psi_contrib,
           |       cast(cast(sum(ci) OVER () as bigint) as double) / 10000 AS psi_total
           |FROM i ORDER BY bin NULLS FIRST""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .select(least(floor(col("value") / 50), lit(9)).cast("int").as("bin"),
          (dayofmonth(col("ts")) <= 15).as("is_base"))
        .groupBy("bin")
        .agg(cnt(col("is_base")).as("base_n"), cnt(!col("is_base")).as("cur_n"))
      val whole = Window.partitionBy()
      val shares = counts
        .select(col("bin"), col("base_n"), col("cur_n"),
          ((col("base_n").cast("double") + 1) /
            (sum(col("base_n")).over(whole).cast("double") + 10)).as("base_share"),
          ((col("cur_n").cast("double") + 1) /
            (sum(col("cur_n")).over(whole).cast("double") + 10)).as("cur_share"))
      shares
        .withColumn("ci", floor((col("base_share") - col("cur_share")) *
          log(col("base_share") / col("cur_share")) * 10000 + 0.5).cast("long"))
        .select(col("bin"), col("base_n"), col("cur_n"), col("base_share"), col("cur_share"),
          (col("ci").cast("double") / 10000).as("psi_contrib"),
          (sum(col("ci")).over(whole).cast("double") / 10000).as("psi_total"))
        .orderBy("bin")
    })

  /** A24 (rebuild extra): first-order Markov transition matrix over each
    * user's event-type sequence — the session-modeling statistic behind
    * next-action prediction and anomaly scoring: P(next | prev) with exact
    * transition counts, rows normalized per prev state.
    *
    * Scale shape: ONE user_id shuffle for the lag window (sequences are
    * per-user, so the window partitions on the shuffle key — no global
    * sort); the (prev, next) aggregate is ≤ |event_types|² groups with
    * map-side partials, and the normalizing window runs on that tiny
    * matrix. Ordering within a user breaks ties on event_id, so the lag is
    * deterministic under any partitioning.
    */
  private val a24 = QueryDef("a24_markov_transitions",
    Some("""WITH seq AS (
           |  SELECT user_id, event_type,
           |         lag(event_type) OVER (PARTITION BY user_id
           |                               ORDER BY cast(ts as timestamp) NULLS FIRST, event_id) AS prev_type
           |  FROM events),
           |c AS (SELECT prev_type, event_type AS next_type, count(*) AS cnt
           |      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
           |SELECT prev_type, next_type, cnt,
           |  floor(cast(cnt as double) /
           |        cast(cast(sum(cnt) OVER (PARTITION BY prev_type) as bigint) as double)
           |        * 10000 + 0.5) / 10000 AS p
           |FROM c ORDER BY prev_type NULLS FIRST, next_type NULLS FIRST""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val counts = ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(seq))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"))
      counts.select(col("prev_type"), col("next_type"), col("cnt"),
          rnd(col("cnt").cast("double") /
            sum(col("cnt")).over(Window.partitionBy("prev_type")).cast("double"), 4).as("p"))
        .orderBy("prev_type", "next_type")
    })

  /** A25 (rebuild extra): per-entity rolling z-score anomaly detection —
    * the streaming-logs outlier primitive (the reference's suspicion
    * scoring is a static rule set; this is its statistical sibling): each
    * event's value scored against the entity's own trailing-20 history,
    * flagged when |z| > 3 with ≥10 observations of warmup.
    *
    * Scale shape: ONE user_id exchange; the trailing frame is a per-user
    * ROWS window over that partitioning (never a per-type global sort — a
    * 5-partition event_type window would funnel 100 TB through 5 tasks).
    * Cross-engine exactness: values quantize to integer cents via
    * decimal(18,2) — the window then carries only integer sums (s1, s2),
    * the anomaly predicate is fully integral
    * ((vc·n − s1)² > 9·(n·s2 − s1²), plus a positive-variance guard), and
    * the reported z is one double division/sqrt of those integers.
    */
  private val a25 = QueryDef("a25_zscore_anomaly",
    Some("""WITH c AS (
           |  SELECT event_id, user_id, cast(ts as timestamp) AS ts, value,
           |         cast(cast(value as decimal(18,2)) * 100 as bigint) AS vc
           |  FROM events WHERE value IS NOT NULL),
           |w AS (
           |  SELECT event_id, user_id, ts, value, vc,
           |    count(*) OVER tw AS n,
           |    cast(sum(vc) OVER tw as bigint) AS s1,
           |    cast(sum(vc * vc) OVER tw as bigint) AS s2
           |  FROM c
           |  WINDOW tw AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
           |                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
           |SELECT event_id, user_id, ts, value, n,
           |  cast(vc * n - s1 as double) / sqrt(cast(n * s2 - s1 * s1 as double)) AS z
           |FROM w
           |WHERE n >= 10 AND n * s2 - s1 * s1 > 0
           |  AND (vc * n - s1) * (vc * n - s1) > 9 * (n * s2 - s1 * s1)
           |ORDER BY event_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tw = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val vc = (col("value").cast("decimal(18,2)") * 100).cast("long")
      // value IS NOT NULL on BOTH sides: a null-valued row would count into
      // the frame's n (count(*)) while contributing nothing to s1/s2,
      // inflating the variance term n·s2−s1² — the z statistic must be over
      // observed values only (same convention as a16/a27/w5).
      val scored = ev(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), vc.as("vc"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("vc"),
          count(lit(1)).over(tw).as("n"),
          sum(col("vc")).over(tw).as("s1"),
          sum(col("vc") * col("vc")).over(tw).as("s2"))
      val d2 = col("n") * col("s2") - col("s1") * col("s1")
      val zn = col("vc") * col("n") - col("s1")
      scored
        .filter(col("n") >= 10 && d2 > 0 && zn * zn > d2 * 9)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("n"),
          (zn.cast("double") / sqrt(d2.cast("double"))).as("z"))
        .orderBy("event_id")
    })

  /** A (rebuild extra): ordered conversion funnel — view → click →
    * purchase, each step within 24 h of the previous step's FIRST
    * qualifying event (gap-window greedy semantics: t1 = first view,
    * t2 = first click in [t1, t1+24h], t3 = first purchase in
    * [t2, t2+24h] — NOT ClickHouse-windowFunnel parity; see the
    * divergence spelled out in [[graft.operators.Funnel]]'s scaladoc).
    *
    * Scale shape: ONE events scan (filter to the 3 step types PUSHED to
    * parquet, projection pruned to 3 columns) and ONE hash exchange on
    * user_id; the three step timestamps are nested whole-partition window
    * minima over that single shuffle (no re-partitioning between the
    * window passes, no self-joins — the join-chain formulation the oracle
    * uses would re-scan events per stage), then a same-key per-user
    * collapse and a 1-row global count. Shuffle volume is the filtered
    * (user_id, ts, type) projection; everything after is #users rows.
    */
  private val a20 = QueryDef("a20_funnel",
    Some("""WITH v AS (SELECT user_id, min(cast(ts as timestamp)) AS t1 FROM events
           |           -- null users excluded by the funnel's entity
           |           -- contract (stepTimes scaladoc); stages 2-3 then
           |           -- drop them for free through the equi-joins
           |           WHERE event_type = 'view' AND user_id IS NOT NULL
           |           GROUP BY user_id),
           |c AS (SELECT e.user_id, min(cast(e.ts as timestamp)) AS t2 FROM events e
           |      JOIN v ON e.user_id = v.user_id
           |      WHERE e.event_type = 'click' AND cast(e.ts as timestamp) >= v.t1
           |        AND cast(e.ts as timestamp) <= v.t1 + INTERVAL 24 HOURS GROUP BY e.user_id),
           |p AS (SELECT e.user_id, min(cast(e.ts as timestamp)) AS t3 FROM events e
           |      JOIN c ON e.user_id = c.user_id
           |      WHERE e.event_type = 'purchase' AND cast(e.ts as timestamp) >= c.t2
           |        AND cast(e.ts as timestamp) <= c.t2 + INTERVAL 24 HOURS GROUP BY e.user_id)
           |-- count(t1), not count(*): a user whose step-1 events ALL
           |-- carry NULL ts forms a group with t1 NULL — it never reached
           |-- the step at a usable time and the engine's count(t1) funnel
           |-- excludes it (the r12 all-null-ts degen plant). Stages 2-3
           |-- match for free (a NULL anchor fails their join predicate).
           |SELECT cast(1 as bigint) AS stage, 'view' AS step, count(t1) AS users FROM v
           |UNION ALL SELECT 2, 'click', count(t2) FROM c
           |UNION ALL SELECT 3, 'purchase', count(t3) FROM p
           |ORDER BY stage""".stripMargin),
    (s, d) => graft.operators.Funnel.funnelCounts(
      ev(s, d), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), expr("INTERVAL 24 HOURS")))

  /** T2/T3: top-k (Spark plans TakeOrderedAndProject — no full sort). */
  private val t2 = QueryDef("t2_topk",
    Some("""SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
           |ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin),
    (s, d) => ev(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("user_id")).limit(10))

  /** A (rebuild extra): HyperLogLog approximate distinct — the mergeable-
    * sketch answer to count-distinct at 100 TB. Exact distinct must
    * shuffle every distinct (group, value) pair; approx_count_distinct
    * carries a constant-size HLL sketch per group that merges map-side,
    * so shuffle volume is (groups × sketch size) regardless of value
    * cardinality. Exact counts sit alongside for self-documenting error.
    *
    * HASH-CHECKED via a bounded-property oracle (r11): the raw HLL
    * estimates are engine-private (DuckDB's HLL is a different
    * implementation ⇒ different estimates, definitionally not
    * hash-replayable), so the REGISTERED output carries the exact counts
    * plus `users_ok`/`events_ok` — in-query assertions that each estimate
    * sits within the 5σ rsd-derived bound of its exact sibling
    * (|approx − exact| ≤ max(2, 0.05·exact) at rsd 0.01; a false here
    * means the sketch is broken, not unlucky — the same contract
    * TrainingPrepSpec asserts on the raw frame). The oracle replays the
    * exact counts and pins the verdicts TRUE, so a broken sketch is a
    * driver-visible hash mismatch rather than a `no_oracle` null row.
    */
  private[graft] def a18Raw(s: SparkSession, d: String): DataFrame = {
      // Three pitfalls engineered around, all measured at sf0.1:
      // (1) the sketches and the exact distinct MUST NOT share one agg — a
      // distinct aggregate in the same Aggregate triggers the Expand
      // rewrite, whose partial aggregation keys on (event_type, value),
      // and then EVERY one of those fine-grained groups carries full HLL
      // buffers through the shuffle (gigabytes at scale). Split, the
      // sketch agg has 5 groups with map-side merge and the exact agg
      // shuffles narrow pairs; the 5-row results broadcast-join together.
      // (2) precision is lgK=14 (rsd ≈ 0.81%), not arbitrarily tight: the
      // 5σ bound below needs rsd ≲ 1%, and register count doubles per lgK.
      // (3, r17) the sketch is DataSketches hll_sketch_agg, NOT Spark's
      // approx_count_distinct: the HLL++ agg materializes one buffer
      // ATTRIBUTE per 64-bit register word (p=14 → ~1.5k attributes per
      // sketch, ~3k-column aggregate rows), which defeats whole-stage
      // codegen (spark.sql.codegen.maxFields=100) and measured 2.9-4.3 s
      // at sf0.1; the DataSketches agg carries ONE binary buffer per
      // sketch through a narrow ObjectHashAggregate (measured ~4× faster,
      // and the shuffled partial is the same constant-size-per-group
      // mergeable either way). Estimates stay inside the 5σ contract
      // (lgK=14 ⇒ rse ≈ 1.04/√2¹⁴ ≈ 0.81%); coalesce(·, 0) pins the
      // all-null-input group to 0 like HLL++ (an empty sketch must
      // compare equal to the exact side's 0, not NULL the verdict).
      val e = ev(s, d)
      def sk(c: String): Column =
        coalesce(hll_sketch_estimate(hll_sketch_agg(col(c), lit(14))), lit(0L))
      val approx = e.groupBy("event_type").agg(
        sk("user_id").as("approx_users"),
        sk("event_id").as("approx_events"),
        count(lit(1)).as("total"))
      val exact = e.groupBy("event_type").agg(
        count_distinct(col("user_id")).as("exact_users"),
        count_distinct(col("event_id")).as("exact_events"))
      // NULL-SAFE join key (r11): both sides' groupBy emit a NULL
      // event_type group (as does the oracle's GROUP BY) — a plain
      // equi-join would silently drop it, a row-count mismatch the day
      // the driver's testdata ships a null event_type.
      approx.join(broadcast(exact.withColumnRenamed("event_type", "et")),
          col("event_type") <=> col("et"))
        .select("event_type", "approx_users", "exact_users",
          "approx_events", "exact_events", "total")
        .orderBy("event_type")
  }

  private def hllOk(approxC: String, exactC: String): Column =
    (abs(col(approxC) - col(exactC)).cast("double") <=
      greatest(lit(2.0), lit(0.05) * col(exactC).cast("double")))

  private val a18 = QueryDef("a18_approx_distinct",
    Some("""SELECT event_type,
           |       count(DISTINCT user_id) AS exact_users,
           |       count(DISTINCT event_id) AS exact_events,
           |       count(*) AS total,
           |       TRUE AS users_ok, TRUE AS events_ok
           |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => a18Raw(s, d).select(col("event_type"),
      col("exact_users"), col("exact_events"), col("total"),
      hllOk("approx_users", "exact_users").as("users_ok"),
      hllOk("approx_events", "exact_events").as("events_ok"))
      .orderBy("event_type"))

  /** HASH-CHECKED approximate distinct — the KMV sketch
    * ([[graft.functions.KmvMinHashes]]) over md5-derived 60-bit integers,
    * the same cross-engine-hash substitution that graduated dd_simhash:
    * a18's HLL registers are engine-private, but KMV's state (the k
    * smallest distinct hashes) is a deterministic function of the value
    * SET, so DuckDB rebuilds the identical sketch with
    * `list_slice(list_sort(list(DISTINCT h)), 1, k)` and the estimate
    * (k−1)·2⁶⁰/u₍ₖ₎ matches bit-for-bit. k=64 → rsd ≈ 1/√63 ≈ 13%
    * (KmvErrorSpec asserts the realized error); the shuffle carries ≤ 64
    * longs per (partition, event_type). Two separate aggregations — NOT
    * two sketches in one agg — for the same Expand-rewrite reason a18
    * documents.
    */
  private val a18b = QueryDef("a18b_kmv_distinct",
    Some("""WITH hu AS (
           |  SELECT DISTINCT event_type,
           |    ('0x' || substr(md5(cast(user_id AS varchar)), 1, 15))::BIGINT AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |he AS (
           |  SELECT DISTINCT event_type,
           |    ('0x' || substr(md5(cast(event_id AS varchar)), 1, 15))::BIGINT AS h
           |  FROM events WHERE event_id IS NOT NULL),
           |mu AS (SELECT event_type, list_slice(list_sort(list(h)), 1, 64) AS ms
           |       FROM hu GROUP BY event_type),
           |me AS (SELECT event_type, list_slice(list_sort(list(h)), 1, 64) AS ms
           |       FROM he GROUP BY event_type)
           |SELECT u.event_type,
           |  CASE WHEN len(u.ms) < 64 THEN cast(len(u.ms) AS double)
           |       ELSE cast(63 AS double) * cast(1152921504606846976 AS double)
           |            / cast(u.ms[64] AS double) END AS est_users,
           |  CASE WHEN len(e.ms) < 64 THEN cast(len(e.ms) AS double)
           |       ELSE cast(63 AS double) * cast(1152921504606846976 AS double)
           |            / cast(e.ms[64] AS double) END AS est_events
           |FROM mu u JOIN me e USING (event_type)
           |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val e = ev(s, d)
      // the cross-engine 60-bit md5-prefix hash and its paired estimator —
      // one definition each, in TopKAgg, beside the 2^60 space size
      def hv(c: Column): Column = graft.functions.TopKAgg.md5Hash60(c)
      def estim(ms: Column): Column =
        graft.functions.TopKAgg.kmvEstimate60(ms, 64)
      val mu = e.filter(col("user_id").isNotNull).groupBy("event_type")
        .agg(graft.functions.TopKAgg.kmvMinHashes(hv(col("user_id")), 64).as("mu"))
      val me = e.filter(col("event_id").isNotNull).groupBy("event_type")
        .agg(graft.functions.TopKAgg.kmvMinHashes(hv(col("event_id")), 64).as("me"))
      mu.join(broadcast(me), "event_type")
        .select(col("event_type"),
          estim(col("mu")).as("est_users"), estim(col("me")).as("est_events"))
        .orderBy("event_type")
    })

  /** T4: top-k + "Others" rollup (draw_pie). Top-k membership via
    * TakeOrderedAndProject + broadcast probe, NOT a global ranking window
    * (which would single-partition the whole counts table — see
    * [[graft.analytics.SshAnalytics.topKWithOthers]]).
    *
    * The NULL name group is excluded from top-k CANDIDACY by contract
    * (r14 fuzz find): an unattributed pseudo-entity isn't a nameable
    * top-k slot, so its counts roll into Others on both engines. Without
    * the exclusion the two sides disagreed the day the null group got
    * big enough to rank: Spark's null-unsafe membership probe sent it to
    * Others while the oracle's CASE rendered a NULL bucket.
    */
  private val t4 = QueryDef("t4_topk_others",
    Some("""WITH counts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
           |ranked AS (SELECT user_id, cnt, row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
           |           FROM counts WHERE user_id IS NOT NULL)
           |SELECT CASE WHEN rn <= 5 THEN cast(user_id as varchar) ELSE 'Others' END AS bucket,
           |       cast(sum(cnt) as bigint) AS cnt
           |FROM (SELECT user_id, cnt, rn FROM ranked
           |      UNION ALL SELECT user_id, cnt, NULL FROM counts WHERE user_id IS NULL)
           |GROUP BY bucket ORDER BY bucket""".stripMargin),
    (s, d) => {
      val counts = ev(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
      graft.analytics.SshAnalytics.topKWithOthers(counts, "user_id", "cnt", 5)
        .select(col("bucket").cast("string").as("bucket"), col("cnt"))
        .orderBy("bucket")
    })

  /** W: ranking window within partition. */
  private val w1 = QueryDef("w1_window_rank",
    Some("""WITH counts AS (SELECT event_type, user_id, count(*) AS cnt
           |                FROM events GROUP BY event_type, user_id)
           |SELECT event_type, user_id, cnt,
           |       row_number() OVER (PARTITION BY event_type
           |                          ORDER BY cnt DESC, user_id NULLS FIRST) AS rn,
           |       rank() OVER (PARTITION BY event_type ORDER BY cnt DESC) AS rnk
           |FROM counts QUALIFY rn <= 5 ORDER BY event_type NULLS FIRST, rn""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d).groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy(desc("cnt"), col("user_id"))
      val wr = Window.partitionBy("event_type").orderBy(desc("cnt"))
      counts.withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(wr))
        .filter(col("rn") <= 5)
        .orderBy("event_type", "rn")
    })

  /** W: lag/lead delta per key. */
  private val w2 = QueryDef("w2_window_lag",
    Some("""SELECT event_id, user_id,
           |       value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
           |FROM events ORDER BY event_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      ev(s, d).select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    })

  /** W: running sum (exact decimal accumulation). */
  private val w3 = QueryDef("w3_running_sum",
    Some("""SELECT event_id, user_id,
           |  cast(sum(cast(value as decimal(18,2))) OVER
           |    (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) as double) AS running_value
           |FROM events ORDER BY event_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).select(col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_value"))
        .orderBy("event_id")
    })

  /** W: exact interpolated percentiles per group, computed from a VALUE
    * HISTOGRAM rather than `percentile()` — `value` quantizes to cents
    * (a25 exploits the same property), so the per-(event_type, value)
    * histogram is bounded by the value domain, not the corpus.
    * `percentile()` buffers every row of the group in one task — the only
    * remaining 100×-unsafe shape this suite had (flagged in the round-8
    * verdict); the histogram path is one map-side-combined groupBy plus
    * windows over the bounded histogram (the tx_eval_auc shape,
    * Eval.scala). Rank r's value = min value with cumulative count ≥ r;
    * interpolation is `lo·(1-d) + hi·d` — the EXACT expression both
    * DuckDB's quantile_cont (Interpolator in quantile.cpp) and Spark's
    * percentile use; `lo + (hi-lo)·d` differs in the last ulp on this very
    * data (14.2475 vs 14.247499999999999 at sf0.01 error/p25).
    */
  /** The bounded per-(event_type, cent-value) histogram with cumulative
    * and total counts that BOTH quantile rewrites (w5, w7) run over —
    * single-sourced so a change to one (e.g. the null convention below)
    * cannot miss the other. NULL values are excluded on the Spark side
    * AND in both oracles' WHERE clauses: the engines disagree on where
    * NULL ranks (Spark windows sort it first, DuckDB's ntile last), so
    * "quantiles of the non-null values" is the only cross-engine-stable
    * contract — and the statistically meaningful one.
    */
  private def valueHistogram(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.filter(col("value").isNotNull)
      .groupBy("event_type", "value").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("event_type").orderBy("value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
  }

  private val w5 = QueryDef("w5_percentiles",
    Some("""SELECT event_type,
           |       quantile_cont(value, 0.25) AS p25,
           |       quantile_cont(value, 0.5) AS p50,
           |       quantile_cont(value, 0.75) AS p75
           |FROM events WHERE value IS NOT NULL
           |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val cum = valueHistogram(ev(s, d))
      // rank indices are 0-based: value at index i = min value with cum ≥ i+1
      def vAt(idx: Column): Column = min(when(col("cum") >= idx + 1, col("value")))
      def h(p: Double): Column = lit(p) * (col("n").cast("double") - 1.0)
      val agged = cum.groupBy("event_type").agg(
        max("n").as("n"),
        vAt(floor(h(0.25))).as("lo25"), vAt(ceil(h(0.25))).as("hi25"),
        vAt(floor(h(0.5))).as("lo50"), vAt(ceil(h(0.5))).as("hi50"),
        vAt(floor(h(0.75))).as("lo75"), vAt(ceil(h(0.75))).as("hi75"))
      def interp(p: Double, lo: Column, hi: Column): Column = {
        val hh = lit(p) * (col("n").cast("double") - 1.0)
        val d = hh - floor(hh).cast("double")
        lo * (lit(1.0) - d) + hi * d
      }
      agged.select(col("event_type"),
        interp(0.25, col("lo25"), col("hi25")).as("p25"),
        interp(0.5, col("lo50"), col("hi50")).as("p50"),
        interp(0.75, col("lo75"), col("hi75")).as("p75"))
        .orderBy("event_type")
    })

  /** W (rebuild extra): time-series gap fill — densify per-user hourly
    * counts onto a complete hour grid (missing hours become explicit
    * zeros) and run a cumulative count over the filled series. The
    * resample step every monitoring/feature pipeline needs: windows over
    * sparse series silently skip empty buckets.
    *
    * Scale shape: the grid is built per user by exploding a broadcast
    * each user's OWN [min, max] activity span (not the global calendar):
    * at scale the global-span grid materializes |users|·|global hours|
    * rows before the left join — per-user spans keep the grid proportional
    * to actual activity, the explode is map-side on the (already narrow)
    * per-user bounds aggregate, and no broadcast bounds row is needed.
    * Semantics: hours outside a user's own first/last event are not
    * zero-filled (gap-fill within each entity's lifetime — the usual
    * time-series normalization); the oracle mirrors this.
    * Zero-fill is a left join on (user, hour); the cumsum re-partitions
    * by user only.
    */
  private val w6 = QueryDef("w6_gap_fill",
    Some("""WITH u AS (SELECT user_id, date_trunc('hour', min(cast(ts as timestamp))) mn,
           |                  date_trunc('hour', max(cast(ts as timestamp))) mx
           |           FROM events GROUP BY user_id),
           |grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM u),
           |c AS (SELECT user_id, date_trunc('hour', cast(ts as timestamp)) h, count(*) cnt
           |      FROM events GROUP BY 1, 2)
           |SELECT g.user_id AS user_id, g.h AS hour, coalesce(c.cnt, 0) AS cnt,
           |  cast(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.user_id ORDER BY g.h
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_cnt
           |FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.h = g.h
           |ORDER BY g.user_id NULLS FIRST, hour""".stripMargin),
    (s, d) => {
      // r17 shape: ONE pass instead of two-scans + grid join. The sparse
      // (user, hour) counts already determine the whole output: a lead()
      // window gives each sparse hour its successor, and exploding
      // sequence(h, nxt−1h) materializes exactly the [min, max] grid —
      // zeros carry the PRECEDING row's running total, so cum_cnt needs
      // no post-explode window. Replaces {2 events scans, 2 aggregates,
      // broadcast left join} with {1 scan, 1 aggregate}; the lead/cum
      // window rides the same user-partitioned exchange the old cum
      // window needed anyway.
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        // null hours never join the oracle's grid (c.h = g.h) — and never
        // enter its bounds (min/max skip nulls); drop them before the agg
        .filter(col("h").isNotNull)
        .groupBy(col("user_id"), col("h"))
        .agg(count(lit(1)).as("raw_cnt"))
      val w = Window.partitionBy("user_id").orderBy("h")
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // oracle semantics pin the NULL-user grid rows to cnt 0 (its LEFT
      // JOIN is on user EQUALITY, which a null user never satisfies)
      val eff = when(col("user_id").isNull, lit(0L)).otherwise(col("raw_cnt"))
      counts
        .withColumn("cnt0", eff)
        .withColumn("cum_cnt", sum(col("cnt0")).over(wcum))
        .withColumn("nxt", lead(col("h"), 1).over(w))
        .select(col("user_id"),
          explode(sequence(col("h"),
            coalesce(col("nxt") - expr("interval 1 hour"), col("h")),
            expr("interval 1 hour"))).as("hour"),
          col("h"), col("cnt0"), col("cum_cnt"))
        .select(col("user_id"), col("hour"),
          when(col("hour") === col("h"), col("cnt0")).otherwise(lit(0L)).as("cnt"),
          col("cum_cnt"))
        .orderBy("user_id", "hour")
    })

  /** W: moving aggregate over a row frame. */
  private val w4 = QueryDef("w4_moving_avg",
    Some("""SELECT event_id, user_id,
           |  cast(sum(cast(value as decimal(18,2))) OVER w AS double) /
           |    (count(*) OVER w) AS moving_avg
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS 2 PRECEDING)
           |ORDER BY event_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
      ev(s, d).select(col("event_id"), col("user_id"),
        (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("moving_avg"))
        .orderBy("event_id")
    })

  // ---- set operations ----------------------------------------------------
  private val su = QueryDef("set_union",
    Some("""SELECT user_id FROM events WHERE event_type = 'click'
           |UNION SELECT user_id FROM events WHERE event_type = 'purchase'
           |ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => {
      val a = ev(s, d).filter(col("event_type") === "click").select("user_id")
      val b = ev(s, d).filter(col("event_type") === "purchase").select("user_id")
      a.union(b).distinct().orderBy("user_id")
    })

  private val si = QueryDef("set_intersect",
    Some("""SELECT user_id FROM events WHERE event_type = 'click'
           |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
           |ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => {
      val a = ev(s, d).filter(col("event_type") === "click").select("user_id")
      val b = ev(s, d).filter(col("event_type") === "purchase").select("user_id")
      a.intersect(b).orderBy("user_id")
    })

  private val se = QueryDef("set_except",
    Some("""SELECT user_id FROM events WHERE event_type = 'click'
           |EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase'
           |ORDER BY user_id NULLS FIRST""".stripMargin),
    (s, d) => {
      val a = ev(s, d).filter(col("event_type") === "click").select("user_id")
      val b = ev(s, d).filter(col("event_type") === "purchase").select("user_id")
      a.except(b).orderBy("user_id")
    })

  // ---- grouping sets -----------------------------------------------------
  private val g1 = QueryDef("g1_rollup",
    Some("""SELECT event_type, cast(ts as date) AS date, count(*) AS cnt,
           |       grouping(event_type, cast(ts as date)) AS gid
           |FROM events GROUP BY ROLLUP (event_type, cast(ts as date))
           |ORDER BY gid, event_type NULLS FIRST, date NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .rollup(col("event_type"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type"), col("date")))

  /** G (rebuild extra): EXPLICIT grouping sets — the general form rollup
    * and cube are sugar for: here (type, hour), (type), and () but NOT
    * (hour) — one Expand pass computes exactly the requested sets, where
    * four chained GROUP BYs would scan four times and union.
    */
  private val g3 = QueryDef("g3_grouping_sets",
    // Per-column grouping() flags, not grouping_id(): engines disagree on
    // the id's bit order, but grouping(col)=1-iff-aggregated is universal.
    Some("""SELECT event_type, hour(cast(ts as timestamp)) AS hr, count(*) AS cnt,
           |       cast(grouping(event_type) as int) AS g_type,
           |       cast(grouping(hour(cast(ts as timestamp))) as int) AS g_hr
           |FROM events
           |GROUP BY GROUPING SETS ((event_type, hour(cast(ts as timestamp))), (event_type), ())
           |ORDER BY g_type, g_hr, event_type NULLS FIRST, hr NULLS FIRST""".stripMargin),
    (s, d) => {
      // The SQL surface is the right tool here: Dataset.groupingSets treats
      // an aliased grouping expression and its unaliased twin as DISTINCT
      // grouping columns (grouping() then can't resolve either), while the
      // SQL form names each set's expressions once.
      ev(s, d).createOrReplaceTempView("g3_events")
      s.sql("""SELECT event_type, hour(ts) AS hr, count(*) AS cnt,
              |       cast(grouping(event_type) as int) AS g_type,
              |       cast(grouping(hour(ts)) as int) AS g_hr
              |FROM g3_events
              |GROUP BY GROUPING SETS ((event_type, hour(ts)), (event_type), ())
              |ORDER BY g_type, g_hr, event_type, hr""".stripMargin)
    })

  private val g2 = QueryDef("g2_cube",
    Some("""SELECT event_type, (value > 100) AS high_value, count(*) AS cnt,
           |       grouping(event_type, (value > 100)) AS gid
           |FROM events GROUP BY CUBE (event_type, (value > 100))
           |ORDER BY gid, event_type NULLS FIRST, high_value NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .cube(col("event_type"), (col("value") > 100).as("high_value"))
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type"), col("high_value")))

  // ======================================================================
  // Streaming-shaped (batch-equivalent) windows — SURVEY §2.8 north star
  // ======================================================================

  /** Tumbling event-time window (batch equivalent of the streaming agg —
    * the streaming parity test runs the same transform over MemoryStream).
    */
  private val st1 = QueryDef("st_tumbling_window",
    Some("""SELECT date_trunc('hour', cast(ts as timestamp)) AS window_start,
           |       event_type, count(*) AS cnt
           |FROM events WHERE ts IS NOT NULL
           |GROUP BY 1, 2 ORDER BY window_start, event_type NULLS FIRST""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))
      .orderBy("window_start", "event_type"))

  /** Sliding window (2h length, 1h slide): each event lands in 2 windows. */
  private val st2 = QueryDef("st_sliding_window",
    Some("""SELECT window_start, count(*) AS cnt FROM (
           |  SELECT date_trunc('hour', cast(ts as timestamp)) - to_hours(o.o) AS window_start
           |  FROM events, (VALUES (0), (1)) o(o) WHERE ts IS NOT NULL)
           |GROUP BY window_start ORDER BY window_start""".stripMargin),
    (s, d) => ev(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"))
      .orderBy("window_start"))

  /** THE 2-hour-gap session derivation, shared by st_sessionization and
    * a29_peak_concurrency — one definition per engine so a gap/tie-break
    * tune can never leave the two computing differently-bounded sessions
    * (the drift class suspicionCtes exists to prevent).
    */
  private val SessionGapMicros = 7200000000L
  private val sessionCtesSql: String =
    s"""flagged AS (
       |  SELECT user_id, ts,
       |    CASE WHEN epoch_us(cast(ts as timestamp)) -
       |              lag(epoch_us(cast(ts as timestamp))) OVER (PARTITION BY user_id ORDER BY event_id)
       |           > $SessionGapMicros THEN 1 ELSE 0 END AS new_session,
       |    event_id
       |  FROM events),
       |sessions AS (
       |  SELECT user_id,
       |    cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) as bigint) AS session_id,
       |    ts FROM flagged)""".stripMargin
  /** (user_id, session_id, ts, event_id) — session ids via lag + running
    * sum over ONE user_id exchange; all downstream windows/groupings on
    * (user_id, session_id) reuse it.
    */
  private def sessionized(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    df.select(col("user_id"), col("ts"), col("event_id"),
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          > SessionGapMicros, 1L).otherwise(0L).as("new_session"))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Batch sessionization: gap-based session ids via lag + running sum —
    * the batch-SQL twin of streaming session windows / mapGroupsWithState.
    */
  private val st3 = QueryDef("st_sessionization",
    Some(s"""WITH $sessionCtesSql
            |SELECT user_id, session_id, count(*) AS n_events,
            |       cast(min(ts) as timestamp) AS session_start
            |FROM sessions GROUP BY user_id, session_id
            |ORDER BY user_id NULLS FIRST, session_id""".stripMargin),
    (s, d) => sessionized(ev(s, d))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .orderBy("user_id", "session_id"))

  /** Batch twin of the stream-stream interval join (the streaming parity
    * test runs [[graft.streaming.StreamingAnalytics.intervalJoin]] itself
    * over MemoryStreams): clicks following an error by the same user
    * within 6 hours. At scale the equality key (user) carries the shuffle —
    * one hash exchange per side — and the time bound is a post-join filter
    * evaluated inside the sort-merge join; streaming state stays bounded
    * by (watermark + window).
    */
  private val st4 = QueryDef("st4_interval_join",
    Some("""SELECT e.user_id AS user_id, e.event_id AS err_id, c.event_id AS click_id,
           |  (epoch_us(cast(c.ts as timestamp)) - epoch_us(cast(e.ts as timestamp))) // 1000000 AS gap_sec
           |FROM events e JOIN events c
           |  ON e.user_id = c.user_id AND e.event_type = 'error' AND c.event_type = 'click'
           |  AND cast(c.ts as timestamp) >= cast(e.ts as timestamp)
           |  AND cast(c.ts as timestamp) <= cast(e.ts as timestamp) + INTERVAL 6 HOUR
           |ORDER BY err_id, click_id""".stripMargin),
    (s, d) => {
      val e = ev(s, d)
      val errs = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
          col("user_id").as("user_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
          col("user_id").as("click_user"))
      graft.streaming.StreamingAnalytics.intervalJoin(errs, clicks,
        "user_id", "click_user", "err_ts", "click_ts", "6 hours")
        .select(col("user_id"), col("err_id"), col("click_id"),
          ((unix_micros(col("click_ts")) - unix_micros(col("err_ts"))) / 1000000L)
            .cast("long").as("gap_sec"))
        .orderBy("err_id", "click_id")
    })

  // ======================================================================
  // Round-8 additions — warehouse/window family completions: unpivot (the
  // inverse of A7's pivot), SCD2 dimension history, blocked fuzzy join
  // (entity resolution), exact-sum correlation, EWMA smoothing, ntile
  // deciles. Same determinism discipline as the rest of the file.
  // ======================================================================

  /** D16 (rebuild extra): melt/unpivot — the inverse of A7's pivot
    * (stats_dashboard.py:103 builds the wide per-IP×event matrix; the
    * charts then re-melt it implicitly). We pivot events per user to the
    * 5-column wide shape, then `Dataset.unpivot` back to long and drop the
    * zero fill. At scale the pivot is one hash aggregate with an explicit
    * value list (no distinct-scan planning pass) and unpivot is map-only
    * (an Expand node — no shuffle, no join).
    */
  private val d16 = QueryDef("d16_unpivot",
    // the pivot runs over the EXPLICIT type list, so a row whose type is
    // outside it (a NULL, or a type the driver adds later) has no wide
    // column and cannot survive the melt — the oracle filters to the same
    // list rather than pretending GROUP BY semantics
    Some(s"""SELECT user_id, event_type, count(*) AS cnt FROM events
            |WHERE event_type IN (${EventTypes.map(t => s"'$t'").mkString(",")})
            |GROUP BY 1, 2 ORDER BY user_id NULLS FIRST, event_type""".stripMargin),
    (s, d) => {
      val types = EventTypes
      val wide = ev(s, d).groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
      wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "cnt")
        .filter(col("cnt") > 0)
        .orderBy("user_id", "event_type")
    })

  /** J12 (rebuild extra): SCD type-2 history build — collapse each user's
    * event_type timeline into versioned validity intervals
    * [valid_from, valid_to) with a run counter and an is_current flag (the
    * warehouse shape a dimension-history table of the reference's per-IP
    * states would take). Single-exchange design: run starts are detected
    * with lag, and valid_to / n_events / version_n all come from windows
    * over the SAME (user_id, event_id) partitioning — no follow-up
    * group-by shuffle; Catalyst stacks the window functions into one sort
    * per exchange. The oracle derives identical intervals via the
    * conventional sum-of-changes + group-by formulation.
    */
  private val j12 = QueryDef("j12_scd2_history",
    Some("""WITH o AS (
           |  SELECT user_id, event_id, cast(ts as timestamp) AS ts, event_type,
           |         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1
           |                OR lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           |                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           |  FROM events
           |), r AS (
           |  SELECT *, cast(sum(chg) OVER (PARTITION BY user_id ORDER BY event_id) as bigint) AS version_n FROM o
           |), g AS (
           |  SELECT user_id, version_n, event_type, min(ts) AS valid_from, count(*) AS n_events
           |  FROM r GROUP BY 1, 2, 3
           |)
           |SELECT user_id, version_n, event_type, valid_from,
           |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_n) AS valid_to,
           |       n_events,
           |       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_n) IS NULL) AS is_current
           |FROM g ORDER BY user_id NULLS FIRST, version_n""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byId = Window.partitionBy("user_id").orderBy("event_id")
      val byUser = Window.partitionBy("user_id")
      val prev = lag(col("event_type"), 1).over(byId)
      // valid_from is min(ts) over the RUN, not the run's first-by-event_id
      // ts — the two agree only while per-user ts is monotone in event_id,
      // a testdata property the driver doesn't guarantee across rounds
      // (round-9 advice). The run-min window partitions by
      // (user_id, version_run): HashPartitioning(user_id) already
      // satisfies that clustered distribution, so this adds a sort but NO
      // second exchange (PlanCheck-gated).
      val base = ev(s, d).select("user_id", "event_id", "ts", "event_type")
        .withColumn("rn", row_number().over(byId))
        .withColumn("n_user", count(lit(1)).over(byUser))
        // NULL-SAFE run detection: `prev =!= cur` is NULL (falsy) when
        // either side is a null event_type, silently merging a null-typed
        // run into its neighbor — while a lag() null also marks the first
        // row. Split the two meanings: rn=1 always starts a run; after
        // that the null-safe inequality decides (null-to-null = same run,
        // matching the oracle's IS DISTINCT FROM).
        .withColumn("chg",
          when(col("rn") === 1 || !(prev <=> col("event_type")), 1L).otherwise(0L))
        .withColumn("version_run", sum(col("chg")).over(byId))
        .withColumn("run_min_ts",
          min(col("ts")).over(Window.partitionBy("user_id", "version_run")))
      val starts = base.filter(col("chg") === 1L)
      starts
        .withColumn("version_n", row_number().over(byId).cast("long"))
        .withColumn("valid_to", lead(col("run_min_ts"), 1).over(byId))
        .withColumn("n_events",
          coalesce(lead(col("rn"), 1).over(byId).cast("long"), col("n_user") + 1L) - col("rn"))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version_n"), col("event_type"),
          col("run_min_ts").as("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
        .orderBy("user_id", "version_n")
    })

  /** J13 (rebuild extra): blocked fuzzy join — entity resolution of a dirty
    * probe list against the customer dimension. Probes are customers with
    * the last two name characters transposed (a deterministic typo model);
    * matching is Levenshtein ≤ 2 inside a blocking key (digits 1-7 of the
    * 9-digit name suffix — every digit the typo model cannot touch), best
    * match per probe by (distance, key). Scale shape: the blocking key
    * bounds candidate pairs per probe (≤100 names share a 7-digit prefix
    * regardless of table size), so there is no quadratic name×name
    * comparison. The join strategy is left to the optimizer/AQE: this
    * probe list is 1/7 of the dimension, so a forced `broadcast()` hint
    * (the round-8 shape) would ship a multi-GB build side at a 100×
    * customer table and risk driver OOM — AQE broadcasts when the probe
    * batch is genuinely small (it is at every test SF) and falls back to a
    * keyed shuffle when it isn't; both shapes are PlanCheck-accepted. The
    * Spark side computes the distance with the THRESHOLDED levenshtein
    * (banded DP, early-exit above 2) — for every kept pair it equals the
    * unbounded distance the oracle computes, but non-matches cost
    * O(len·k) instead of O(len²).
    *
    * DOMAIN CONTRACT (r17, pinned like TextFunctions.asciiLower's): this
    * query's name columns are ASCII BY CONTRACT. The two engines' edit
    * distances agree ONLY there — Spark's levenshtein counts CODE-POINT
    * edits while DuckDB's counts BYTE edits (measured: 'é'→'e' is 1 in
    * Spark, 2 in DuckDB; any non-ASCII char multiplies its edit cost by
    * its UTF-8 byte length). The probe synthesis (digit transposition on
    * TPC-H c_name, ASCII by generator spec) keeps every input inside the
    * agreeing domain; UnicodeDomainSpec asserts both the divergence and
    * the testdata domain, so a corpus change that injects non-ASCII names
    * fails a gate instead of silently flipping nearest matches.
    */
  private val j13 = QueryDef("j13_fuzzy_join",
    Some("""WITH probes AS (
           |  SELECT c_custkey AS probe_id,
           |         substr(c_name,1,16) || substr(c_name,18,1) || substr(c_name,17,1) AS probe_name
           |  FROM customer WHERE c_custkey % 7 = 3
           |), cand AS (
           |  SELECT p.probe_id, p.probe_name, c.c_custkey, c.c_name,
           |         levenshtein(p.probe_name, c.c_name) AS dist
           |  FROM probes p JOIN customer c
           |    ON substr(p.probe_name, 10, 7) = substr(c.c_name, 10, 7)
           |  WHERE levenshtein(p.probe_name, c.c_name) <= 2
           |), best AS (
           |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY dist, c_custkey) AS rn FROM cand
           |)
           |SELECT probe_id, probe_name, c_custkey AS match_key, c_name AS match_name,
           |       cast(dist as int) AS dist
           |FROM best WHERE rn = 1 ORDER BY probe_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val probes = cust.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey").as("probe_id"),
          concat(substring(col("c_name"), 1, 16), substring(col("c_name"), 18, 1),
            substring(col("c_name"), 17, 1)).as("probe_name"))
      // spread the stream side before the Levenshtein kernel: the one-split
      // customer file otherwise evaluates every blocked pair's edit
      // distance in a single task (834 ms of the query at sf0.1 —
      // Guards.spread, identity at cluster-width split counts)
      val joined = probes.withColumn("blk", substring(col("probe_name"), 10, 7))
        .join(graft.operators.Guards.spread(cust)
          .withColumn("blk", substring(col("c_name"), 10, 7)), Seq("blk"))
        .withColumn("dist", levenshtein(col("probe_name"), col("c_name"), 2))
        .filter(col("dist") >= 0)
      val byProbe = Window.partitionBy("probe_id").orderBy(col("dist"), col("c_custkey"))
      joined.withColumn("rn", row_number().over(byProbe)).filter(col("rn") === 1)
        .select(col("probe_id"), col("probe_name"), col("c_custkey").as("match_key"),
          col("c_name").as("match_name"), col("dist"))
        .orderBy("probe_id")
    })

  /** A26 (rebuild extra): per-group Pearson correlation from exact partial
    * sums — corr(value, hour) per event_type. The six sufficient statistics
    * (n, Σx, Σx², Σy, Σy², Σxy) accumulate EXACTLY (decimal/bigint) in one
    * partial-aggregated pass, then the correlation is assembled in double
    * with the identical expression tree on both engines, so the result is
    * bit-deterministic — unlike engine-native corr(), whose streaming float
    * accumulation is order- (and therefore partitioning-) dependent. This
    * is also the scale shape: the shuffle carries 6 numbers per group.
    */
  private val a26 = QueryDef("a26_corr_stats",
    Some("""WITH h AS (
           |  SELECT event_type, cast(value as decimal(18,2)) AS x,
           |         cast(hour(cast(ts as timestamp)) as bigint) AS y
           |  FROM events
           |), s AS (
           |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
           |         sum(y) AS sy, sum(y*y) AS syy, sum(x*y) AS sxy
           |  FROM h GROUP BY 1
           |), f AS (
           |  SELECT event_type, n, cast(n as double) AS nd,
           |         cast(sx as double) AS sxd, cast(sxx as double) AS sxxd,
           |         cast(sy as double) AS syd, cast(syy as double) AS syyd,
           |         cast(sxy as double) AS sxyd
           |  FROM s
           |)
           |SELECT event_type, n,
           |       CASE WHEN nd*sxxd - sxd*sxd > 0 AND nd*syyd - syd*syd > 0
           |            THEN (nd*sxyd - sxd*syd) /
           |                 (sqrt(nd*sxxd - sxd*sxd) * sqrt(nd*syyd - syd*syd))
           |       END AS corr_value_hour
           |FROM f ORDER BY event_type NULLS FIRST""".stripMargin),
    (s, d) => {
      val sums = ev(s, d)
        .select(col("event_type"), col("value").cast("decimal(18,2)").as("x"),
          hour(col("ts")).cast("long").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("n"), col("n").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"), col("sxx").cast("double").as("sxxd"),
          col("sy").cast("double").as("syd"), col("syy").cast("double").as("syyd"),
          col("sxy").cast("double").as("sxyd"))
      // zero-variance guard, mirrored in the oracle's CASE: a constant-x
      // or constant-y group makes the denominator exactly 0 — ANSI would
      // kill the query with DIVIDE_BY_ZERO and the engines disagree on
      // NULL-vs-NaN without it; corr is undefined there, so NULL it is
      sums.select(col("event_type"), col("n"),
        when((col("nd") * col("sxxd") - col("sxd") * col("sxd")) > 0 &&
             (col("nd") * col("syyd") - col("syd") * col("syd")) > 0,
          (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            (sqrt(col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
              sqrt(col("nd") * col("syyd") - col("syd") * col("syd")))).as("corr_value_hour"))
        .orderBy("event_type")
    })

  /** A27 (rebuild extra): EWMA smoothing per user (α = 0.5) over a bounded
    * 8-event lookback: e = fold(0.5·x + 0.5·e) over the trailing window,
    * oldest→newest. The trailing values are gathered by a ROWS-frame
    * collect_list (frame order = window order in both engines) and folded
    * with a left fold — Spark `aggregate` seeded with the oldest element,
    * DuckDB `list_reduce`, same association order → bit-identical doubles.
    * Bounding the lookback keeps per-row state O(8) at any history length
    * (an unbounded EWMA needs the recursive form, which is the a25 z-score
    * family's job); the only exchange is the user_id window partition.
    */
  private val a27 = QueryDef("a27_ewma",
    // WHERE value IS NOT NULL on BOTH sides: Spark's collect_list silently
    // drops nulls while DuckDB's list() keeps them (0.5*NULL poisons the
    // fold) — excluding null-valued events from the series and the output
    // is the one convention the engines can share
    Some("""SELECT event_id, user_id,
           |  list_reduce(list(value) OVER w, (acc, x) -> 0.5*x + 0.5*acc) AS ewma
           |FROM events WHERE value IS NOT NULL
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS 7 PRECEDING)
           |ORDER BY event_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-7, 0)
      ev(s, d).filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), collect_list(col("value")).over(w).as("arr"))
        .select(col("event_id"), col("user_id"),
          aggregate(slice(col("arr"), 2, 7), element_at(col("arr"), 1),
            (acc, x) => lit(0.5) * x + lit(0.5) * acc).as("ewma"))
        .orderBy("event_id")
    })

  /** W7 (rebuild extra): ntile decile bucketing — equal-frequency deciles
    * of value within each event_type (the quantile-bucket shape behind the
    * reference's score histogram at stats_dashboard.py:163, but
    * rank-exact rather than fixed-width). The oracle states it as
    * `ntile(10) OVER (ORDER BY value, event_id)`; the Spark side computes
    * the IDENTICAL buckets from the bounded value histogram instead of
    * sorting the corpus through |event_type| partitions (the round-8
    * verdict's other 100×-unsafe shape). Key fact: the reported columns
    * (cnt, lo, hi) depend only on each bucket's rank RANGE, not on which
    * tied row lands where — the event_id tie-break totalizes the order
    * inside one value, but all those rows share that value, so bucket k's
    * lo/hi are the values at its 0-based rank endpoints
    * [start_k, end_k-1], read off the cumulative histogram. Sizes follow
    * the SQL-standard ntile rule (first n mod 10 buckets get the extra
    * row); buckets beyond n rows are absent, as ntile emits none.
    */
  private val w7 = QueryDef("w7_ntile_deciles",
    Some("""WITH t AS (
           |  SELECT event_type, value,
           |         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
           |  FROM events WHERE value IS NOT NULL)
           |SELECT event_type, cast(decile as int) AS decile, count(*) AS cnt,
           |       min(value) AS lo, max(value) AS hi
           |FROM t GROUP BY 1, 2 ORDER BY event_type NULLS FIRST, decile""".stripMargin),
    (s, d) => {
      val dec = valueHistogram(ev(s, d))
        .withColumn("decile", explode(array((1 to 10).map(lit): _*)))
        .withColumn("base", expr("n div 10"))
        .withColumn("extra", col("n") % 10)
        // 0-based rank range of bucket k: [start, start + sz)
        .withColumn("start",
          (col("decile") - 1) * col("base") + least(col("decile") - 1, col("extra")))
        .withColumn("sz", col("base") + when(col("decile") <= col("extra"), 1L).otherwise(0L))
      dec.groupBy("event_type", "decile").agg(
          max(col("sz")).as("cnt"),
          min(when(col("cum") >= col("start") + 1, col("value"))).as("lo"),
          min(when(col("cum") >= col("start") + col("sz"), col("value"))).as("hi"))
        .filter(col("cnt") > 0)
        .orderBy("event_type", "decile")
    })

  /** G4 (rebuild extra): PageRank — the iterative-graph-computation family
    * member beyond dd_cluster_canonical's connected components. Graph: the
    * per-user transition graph over the `k` property (nodes = k values,
    * edge weight = #times a user moved k_prev→k), i.e. the same graph
    * a24_markov_transitions summarizes — PageRank ranks its hubs. Three
    * damped iterations (d=0.85) in FIXED-POINT arithmetic: ranks are
    * bigints scaled by 2^20 and every per-edge contribution is
    * floor-divided BEFORE the incoming sum, so the reduction is
    * order-free (the same determinism trick as tx_train_lr) and the
    * oracle replays all three iterations as unrolled CTEs and
    * hash-matches the exact ranks.
    *
    * Scale shape — aggregate, COLLECT, iterate (r14): the one data-sized
    * job is the edge aggregation (a user_id window + one (src,dst)
    * partial agg — [[g4Edges]], plan-gated); its result is ≤|k|² rows for
    * the ≤100-value k vocabulary REGARDLESS of corpus size, i.e. a
    * bounded model artifact exactly like the k-means centroid collects,
    * and the three iterations run on it driver-side. Through r13 the
    * iterations were lazy vocabulary-sized Spark joins instead — correct,
    * but the 7-stage chain (3 × (2 broadcast joins + an agg) + nodes
    * distinct) cost ~8 s of pure stage/exchange overhead at sf0.1
    * against ~2.4 s for the edge aggregation itself (Probe, r14), and at
    * 1000 executors that overhead only grows: scheduling 7 barriers of
    * 32-task stages to move ≤10⁴ rows is the anti-pattern the
    * bounded-artifact collects exist to avoid. Long arithmetic on the
    * driver is bit-identical to the distributed expressions, so the
    * oracle hash is unchanged.
    *
    * Construction now runs the edge job, so every plan-gating session
    * (PlanCheck, PlanFingerprint, PlanDrift) pays one edge aggregation
    * to plan this query — a DELIBERATE trade, same as the Lloyd-collect
    * builders: memoizing the collected edges per (session, dir) would
    * shave those gate seconds but let Bench's second timed pass hit the
    * memo and report ~0 s, corrupting the benchmark the gates exist to
    * protect.
    */
  private val g4 = QueryDef("g4_pagerank",
    Some(s"""WITH ks AS (
            |  SELECT user_id, event_id, $kSql AS k FROM events
            |), seq AS (
            |  SELECT user_id, k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS k_prev
            |  FROM ks WHERE k IS NOT NULL
            |), edges AS (
            |  SELECT k_prev AS src, k AS dst, count(*) AS w
            |  FROM seq WHERE k_prev IS NOT NULL AND k_prev <> k
            |  GROUP BY 1, 2
            |), nodes AS (
            |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
            |), nn AS (SELECT count(*) AS n FROM nodes),
            |outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
            |r0 AS (SELECT node, 1048576 // (SELECT n FROM nn) AS r FROM nodes),
            |c1 AS (SELECT e.dst AS node, sum((r0.r * e.w) // o.wout) AS s
            |       FROM edges e JOIN r0 ON e.src = r0.node JOIN outw o ON e.src = o.src GROUP BY 1),
            |r1 AS (SELECT n.node, (15 * 1048576) // (100 * (SELECT n FROM nn))
            |         + (85 * coalesce(c1.s, 0)) // 100 AS r
            |       FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
            |c2 AS (SELECT e.dst AS node, sum((r1.r * e.w) // o.wout) AS s
            |       FROM edges e JOIN r1 ON e.src = r1.node JOIN outw o ON e.src = o.src GROUP BY 1),
            |r2 AS (SELECT n.node, (15 * 1048576) // (100 * (SELECT n FROM nn))
            |         + (85 * coalesce(c2.s, 0)) // 100 AS r
            |       FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
            |c3 AS (SELECT e.dst AS node, sum((r2.r * e.w) // o.wout) AS s
            |       FROM edges e JOIN r2 ON e.src = r2.node JOIN outw o ON e.src = o.src GROUP BY 1),
            |r3 AS (SELECT n.node, (15 * 1048576) // (100 * (SELECT n FROM nn))
            |         + (85 * coalesce(c3.s, 0)) // 100 AS r
            |       FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
            |SELECT node, cast(r as bigint) AS rank_fp
            |FROM r3 ORDER BY node""".stripMargin),
    (s, d) => {
      val S = 1048576L
      // ONE event-scale job: the (src, dst, w) transition-edge aggregate,
      // collected as the bounded model artifact the iterations run on.
      // The bound is a CONTRACT (≤|k|² for the ≤100-value k vocabulary),
      // so it's enforced mechanically: the limit probe caps what can
      // reach the driver in the same single job, and a corpus whose k
      // vocabulary violates the contract fails loudly instead of
      // silently OOMing the driver. 2^20 edge rows ≈ 24 MB — two orders
      // above the contract, far below driver memory.
      val maxEdges = g4MaxEdges
      val probed = g4Edges(s, d).limit(maxEdges + 1).collect()
      if (probed.length > maxEdges)
        throw new IllegalStateException(
          s"g4_pagerank: transition-edge table exceeds $maxEdges rows — the k vocabulary " +
            "is not bounded on this corpus, so the driver-side iteration contract " +
            "(edges ≤ |k|² for a ≤100-value vocabulary) does not hold; use a " +
            "distributed iterate for this graph")
      val edges = probed.map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val wout: Map[Int, Long] =
        edges.groupBy(_._1).map { case (src, es) => src -> es.iterator.map(_._3).sum }
      val nodes: Array[Int] = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val n = nodes.length.toLong
      // exact Long arithmetic, floor division on non-negative values —
      // bit-identical to the oracle's // at every step
      var rank: Map[Int, Long] = nodes.iterator.map(nd => nd -> S / n).toMap
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.HashMap.empty[Int, Long]
        edges.foreach { case (src, dst, w) =>
          contrib.update(dst, contrib.getOrElse(dst, 0L) + (rank(src) * w) / wout(src))
        }
        rank = nodes.iterator.map(nd =>
          nd -> ((15L * S) / (100L * n) + (85L * contrib.getOrElse(nd, 0L)) / 100L)).toMap
      }
      import s.implicits._
      nodes.toSeq.map(nd => (nd, rank(nd))).toDF("node", "rank_fp").orderBy("node")
    })

  /** The driver-contract edge cap g4_pagerank probes with `limit(g4MaxEdges
    * + 1)` — shared with PlanCheck so the gated plan is the PROBED shape
    * the query actually executes (limit included), not the bare aggregate.
    */
  private[graft] val g4MaxEdges: Int = 1 << 20

  /** g4_pagerank's single data-sized job, exposed so PlanCheck can gate
    * the EDGE plan (partitioned window, map-side partial agg, pruned
    * scan) — the returned query's own plan is only the ≤|k|-row local
    * relation the driver iterations produced.
    */
  private[graft] def g4Edges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    ev(s, d).select(col("user_id"), col("event_id"), kCol.as("k"))
      .filter(col("k").isNotNull)
      .withColumn("k_prev", lag(col("k"), 1).over(byUser))
      .filter(col("k_prev").isNotNull && col("k_prev") =!= col("k"))
      .groupBy(col("k_prev").as("src"), col("k").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** A28 (rebuild extra): last-touch attribution — each purchase credited
    * to the same user's most recent click within a 3-day window, revenue
    * rolled up by the attributed click's hour (unattributed → -1). The
    * as-of step is [[graft.operators.TemporalJoins.asOfJoin]]'s union +
    * one-shuffle sort-merge formulation (no per-row range probe); the
    * 3-day bound is a post-match filter, and the rollup is a ≤25-group
    * aggregate. The oracle replays the identical union/last_value(IGNORE
    * NULLS) window — same tie semantics (click at exactly the purchase ts
    * is visible; greatest event_id wins among equal-ts clicks).
    */
  private val a28 = QueryDef("a28_attribution",
    Some("""WITH u AS (
           |  SELECT user_id, cast(ts as timestamp) AS ts, FALSE AS is_r, event_id,
           |         cast(value as decimal(18,2)) AS value, NULL AS click_id, NULL AS cts
           |  FROM events WHERE event_type = 'purchase'
           |  UNION ALL
           |  SELECT user_id, cast(ts as timestamp), TRUE, event_id,
           |         NULL, event_id, cast(ts as timestamp)
           |  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
           |), w AS (
           |  SELECT *,
           |    last_value(CASE WHEN is_r THEN click_id END IGNORE NULLS) OVER win AS a_click,
           |    last_value(CASE WHEN is_r THEN cts END IGNORE NULLS) OVER win AS a_cts
           |  FROM u
           |  WINDOW win AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, is_r DESC, event_id
           |                 ROWS UNBOUNDED PRECEDING)
           |), p AS (
           |  SELECT CASE WHEN a_click IS NOT NULL
           |              AND epoch_us(ts) - epoch_us(a_cts) <= 259200000000
           |         THEN hour(a_cts) ELSE -1 END AS click_hour, value
           |  FROM w WHERE NOT is_r
           |)
           |SELECT click_hour, count(*) AS n_purchases,
           |       cast(sum(value) as double) AS revenue
           |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").cast("decimal(18,2)").as("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      val matched = graft.operators.TemporalJoins.asOfJoin(
        purchases, clicks, "user_id", "ts", "cts", "click_id", Seq.empty)
      val attributed = matched.withColumn("click_hour",
        when(col("asof").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("asof.cts")) <= 259200000000L,
          hour(col("asof.cts"))).otherwise(-1))
      attributed.groupBy("click_hour")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value")).cast("double").as("revenue"))
        .orderBy("click_hour")
    })

  /** A29 (rebuild extra): interval analytics — per-day PEAK session
    * concurrency (max sessions simultaneously active), over the same
    * 2-hour-gap sessions as st_sessionization. The textbook formulation is
    * one GLOBAL ordered sweep (+1 at start, −1 at end, running max) — a
    * single-partition sort that cannot scale. This partitions the sweep by
    * DAY and adds a carry-in per day (sessions spanning midnight, counted
    * by a 30-row broadcast interval join), so concurrency(t) =
    * carry(day) + prefix-sum of that day's boundary events: each day's
    * sweep is an independent window partition, and days × spanning-
    * sessions is the only cross-partition work. Touching sessions count as
    * concurrent (+1 sorts before −1 at equal timestamps, deterministic
    * tie-break by (user, sid)).
    */
  private val a29 = QueryDef("a29_peak_concurrency",
    Some(s"""WITH $sessionCtesSql,
           |sess AS (
           |  SELECT user_id, session_id AS sid,
           |         cast(min(ts) as timestamp) AS s_start,
           |         cast(max(ts) as timestamp) AS s_end
           |  FROM sessions GROUP BY 1, 2
           |), ev AS (
           |  SELECT cast(s_start as date) AS d, s_start AS pt, 1 AS delta, user_id, sid FROM sess
           |  UNION ALL
           |  SELECT cast(s_end as date), s_end, -1, user_id, sid FROM sess
           |), days AS (
           |  SELECT unnest(generate_series(cast(min(cast(s_start as date)) as date),
           |                                cast(max(cast(s_end as date)) as date),
           |                                INTERVAL 1 DAY))::date AS d
           |  FROM sess
           |), carry AS (
           |  SELECT days.d, count(*) AS c
           |  FROM days JOIN sess
           |    ON sess.s_start < cast(days.d as timestamp) AND sess.s_end >= cast(days.d as timestamp)
           |  GROUP BY 1
           |), sweep AS (
           |  SELECT d, delta, sum(delta) OVER (PARTITION BY d ORDER BY pt, delta DESC, user_id, sid
           |                                    ROWS UNBOUNDED PRECEDING) AS run
           |  FROM ev
           |), agg AS (
           |  SELECT d, cast(max(run) as bigint) AS max_run,
           |         cast(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) as bigint) AS sessions_started
           |  FROM sweep GROUP BY 1
           |)
           |SELECT days.d AS date, coalesce(carry.c, 0) AS carry_in,
           |       coalesce(carry.c, 0) + greatest(coalesce(agg.max_run, 0), 0) AS peak_concurrency,
           |       coalesce(agg.sessions_started, 0) AS sessions_started
           |FROM days LEFT JOIN agg ON days.d = agg.d LEFT JOIN carry ON days.d = carry.d
           |ORDER BY date""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sess = sessionized(ev(s, d))
        .withColumnRenamed("session_id", "sid")
        .groupBy("user_id", "sid")
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val evts = sess.select(to_date(col("s_start")).as("d"), col("s_start").as("pt"),
          lit(1L).as("delta"), col("user_id"), col("sid"))
        .unionAll(sess.select(to_date(col("s_end")).as("d"), col("s_end").as("pt"),
          lit(-1L).as("delta"), col("user_id"), col("sid")))
      // calendar spine over the covered range, NOT just boundary-event
      // days: a session spanning a quiet day still raises that day's
      // concurrency, so the day must get a row (carry-only, no sweep).
      val days = sess
        .agg(min(to_date(col("s_start"))).as("d0"), max(to_date(col("s_end"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      val carry = broadcast(days).join(sess,
          col("s_start") < col("d").cast("timestamp") &&
            col("s_end") >= col("d").cast("timestamp"))
        .groupBy("d").agg(count(lit(1)).as("c"))
      val sweepW = Window.partitionBy("d")
        .orderBy(col("pt"), col("delta").desc, col("user_id"), col("sid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val agg0 = evts.withColumn("run", sum(col("delta")).over(sweepW))
        .groupBy("d").agg(max(col("run")).as("max_run"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("sessions_started"))
      days.join(agg0, Seq("d"), "left").join(carry, Seq("d"), "left")
        .select(col("d").as("date"), coalesce(col("c"), lit(0L)).as("carry_in"),
          (coalesce(col("c"), lit(0L)) +
            greatest(coalesce(col("max_run"), lit(0L)), lit(0L)))
            .as("peak_concurrency"),
          coalesce(col("sessions_started"), lit(0L)).as("sessions_started"))
        .orderBy("date")
    })

  // ---- registry ----------------------------------------------------------
  private[graft] val core: Seq[QueryDef] = Seq(
    s1, s2, s4, s7, s8, s9, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, p1, p2, p6, p9, p10, pp, d1, d2, d3, d6, d7, d8, d10, d14,
    a1, a4, a6, a7, a9, a13, a14, a15, a16, a17, a18, a18b, a19, a19b, a20, a21, a22, a23, a24, a25,
    j1, j2, j2ps, j3, j4, j5, j6, j7, j8, j9, j10, j11,
    t2, t4, w1, w2, w3, w4, w5, w6, w7, su, si, se, g1, g2, g3,
    st1, st2, st3, st4, d16, j12, j13, a26, a27, a28, a29, g4)

  val all: Seq[QueryDef] = core ++ QueriesExt.all

  // lazy vals, not defs: Bench/Probe look a query up once per pass, and a
  // def would rebuild the whole 146-entry Map on every lookup
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
