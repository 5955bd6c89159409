package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the docstore connector's JSON-lines encoding must be a
  * faithful round-trip for ARBITRARY values — in particular strings
  * containing newlines (which MUST be escaped or the line framing breaks),
  * quotes, backslashes, unicode, and the empty string (distinct from
  * null/absent), plus doubles incl. negatives and extreme magnitudes
  * (a shortest-repr printer that loses ulps would corrupt embeddings).
  */
class DocStorePropSpec extends SparkSpec {

  private val trickyString: Gen[String] = Gen.oneOf[Gen[String]](
    Gen.const(Gen.const("line\nbreak\r\n")),
    Gen.const(Gen.const("""quote " backslash \ slash /""")),
    Gen.const(Gen.const("unicode ünïcødé é中文")),
    Gen.const(Gen.const("")), // empty ≠ null
    Gen.const(Gen.const("\t tab  control")),
    Gen.asciiPrintableStr.map(_.take(20)),
    Gen.listOfN(5, Gen.oneOf('a', '"', '\\', '\n', '{', '}')).map(_.mkString)
  ).flatMap(identity)

  private val trickyDouble: Gen[Double] = Gen.oneOf(
    Gen.const(0.0), Gen.const(-0.0), Gen.const(1.5e-300), Gen.const(-9.87e300),
    Gen.const(0.1 + 0.2), // classic non-representable sum
    Gen.choose(-1e6, 1e6))

  private val row: Gen[(Long, Option[String], Option[Double], Option[Long], Option[Boolean])] =
    for {
      id <- Gen.choose(0L, 1000000L)
      s <- Gen.option(trickyString)
      d <- Gen.option(trickyDouble)
      l <- Gen.option(Gen.oneOf[Gen[Long]](Gen.const(Long.MinValue), Gen.const(Long.MaxValue),
        Gen.choose(-1e15.toLong, 1e15.toLong)).flatMap(g => g))
      b <- Gen.option(Gen.oneOf(true, false))
    } yield (id, s, d, l, b)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- read-path fault injection (r12) -----------------------------------
  // At 100 TB partial corruption is a when, not an if. Writes are
  // crash-safe and commit-serialized (r10-r11); these cases pin the READ
  // path's contract per artifact class: a torn/corrupt _stats.json,
  // _schema.json, version manifest, or shard file fails LOUDLY with the
  // artifact named and a recovery recipe — never silent wrong/partial
  // rows — while a MISSING stats file stays the documented legacy
  // stats-less fallback (absence ≠ corruption).

  private def faultStore(gzip: Boolean): String = {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"doc$i", i * 1.5)).toDF("id", "s", "d")
    val dir = Files.createTempDirectory("graft_docstore_fault").toString
    val w = df.coalesce(2).write.format("docstore").mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).save(dir)
    dir
  }

  private def chainMsg(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(c.getMessage).append(" | "); c = c.getCause }
    sb.toString
  }

  private def truncateFile(p: java.nio.file.Path, keep: Double): Unit = {
    val bytes = Files.readAllBytes(p)
    Files.write(p, bytes.take(math.max(1, (bytes.length * keep).toInt)))
  }

  // shards = the collection dir's regular files minus metadata ("_"-led);
  // resolved by listing, not internals — the connector object is
  // package-private by design
  private def shardPaths(dir: String): Seq[java.nio.file.Path] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala.toSeq.filter(p =>
      Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
    finally s.close()
  }

  test("fault injection: torn _stats.json fails loudly — never pruned-by-guess") {
    val dir = faultStore(gzip = false)
    truncateFile(java.nio.file.Paths.get(dir, "_stats.json"), 0.5)
    // a PUSHED filter makes the planner consult stats for pruning — the
    // read path that must refuse a half-parsed ledger (a filterless scan
    // never reads stats: pruning is its only scan-side consumer)
    val e = intercept[Exception](
      spark.read.format("docstore").load(dir)
        .filter(org.apache.spark.sql.functions.col("id") > 10L).collect())
    assert(chainMsg(e).contains("_stats.json"), chainMsg(e))
    assert(chainMsg(e).contains("corrupt or torn"), chainMsg(e))
  }

  // Hadoop's LocalFileSystem keeps .crc sidecars, so an out-of-band
  // overwrite trips a checksum error at READ time (covered by the torn
  // cases above/below). Dropping the sidecar lets the corrupt CONTENT
  // reach the parser — pinning the parse-level guard specifically, the
  // path a consistent-but-wrong artifact (torn write with rewritten
  // crc, crc-less object store) takes in production.
  private def dropCrc(dir: String, name: String): Unit =
    Files.deleteIfExists(java.nio.file.Paths.get(dir, s".$name.crc"))

  test("fault injection: structurally broken stats (lost count) is loud") {
    val dir = faultStore(gzip = false)
    Files.write(java.nio.file.Paths.get(dir, "_stats.json"),
      """{"someshard.jsonl": {"fields": {}}}""".getBytes("UTF-8"))
    dropCrc(dir, "_stats.json")
    val e = intercept[Exception](
      spark.read.format("docstore").load(dir)
        .filter(org.apache.spark.sql.functions.col("id") > 10L).collect())
    assert(chainMsg(e).contains("structurally corrupt"), chainMsg(e))
    assert(chainMsg(e).contains("count"), chainMsg(e))
  }

  test("fault injection: unparseable stats JSON is loud at the parser") {
    val dir = faultStore(gzip = false)
    Files.write(java.nio.file.Paths.get(dir, "_stats.json"),
      """{"someshard.jsonl": {"count": 3""".getBytes("UTF-8")) // torn mid-object
    dropCrc(dir, "_stats.json")
    val e = intercept[Exception](
      spark.read.format("docstore").load(dir)
        .filter(org.apache.spark.sql.functions.col("id") > 10L).collect())
    assert(chainMsg(e).contains("_stats.json"), chainMsg(e))
    assert(chainMsg(e).contains("corrupt or torn"), chainMsg(e))
  }

  test("fault injection: corrupt _schema.json is loud and never guessed around") {
    val dir = faultStore(gzip = false)
    Files.write(java.nio.file.Paths.get(dir, "_schema.json"),
      "NOT (( a ddl".getBytes("UTF-8"))
    val e = intercept[Exception](spark.read.format("docstore").load(dir).collect())
    assert(chainMsg(e).contains("_schema.json"), chainMsg(e))
  }

  test("fault injection: truncated gzip shard names the shard, not a codec trace") {
    val dir = faultStore(gzip = true)
    val shard = shardPaths(dir).maxBy(p => Files.size(p))
    truncateFile(shard, 0.6)
    val e = intercept[Exception](spark.read.format("docstore").load(dir).collect())
    assert(chainMsg(e).contains("corrupt or torn"), chainMsg(e))
    assert(chainMsg(e).contains(shard.getFileName.toString), chainMsg(e))
  }

  test("fault injection: half-written trailing line in a plain shard is loud") {
    val dir = faultStore(gzip = false)
    val shard = shardPaths(dir).maxBy(p => Files.size(p))
    Files.write(shard, "\n{\"id\":999,\"s\":\"unterm".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val e = intercept[Exception](spark.read.format("docstore").load(dir).collect())
    assert(chainMsg(e).contains("corrupt or torn"), chainMsg(e))
    assert(chainMsg(e).contains(shard.getFileName.toString), chainMsg(e))
  }

  test("fault injection: corrupt version manifest is loud, not an empty collection") {
    val dir = faultStore(gzip = false)
    val commits = Files.list(java.nio.file.Paths.get(dir, "_commits"))
    val manifest =
      try commits.iterator().asScala.toSeq
        .filter(_.getFileName.toString.matches("v\\d+\\.json")).maxBy(_.getFileName.toString)
      finally commits.close()
    val v = manifest.getFileName.toString.stripPrefix("v").stripSuffix(".json").toInt
    Files.write(manifest, """{"not": "shards"}""".getBytes("UTF-8"))
    // through the user-visible time-travel read, not connector internals
    val e = intercept[Exception](
      spark.read.format("docstore").option("version", v).load(dir).collect())
    assert(chainMsg(e).contains("manifest"), chainMsg(e))
    assert(chainMsg(e).contains("corrupt or torn"), chainMsg(e))
  }

  test("fault injection contrast: MISSING stats is the documented fallback, not an error") {
    val dir = faultStore(gzip = false)
    Files.delete(java.nio.file.Paths.get(dir, "_stats.json"))
    assert(spark.read.format("docstore").load(dir).count() === 200L)
  }

  test("round-trip identity on adversarial values (newlines, unicode, extremes)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType), StructField("d", DoubleType),
      StructField("l", LongType), StructField("b", BooleanType)))
    (1L to 5L).foreach { seed =>
      val data = sample(Gen.listOfN(60, row), seed).zipWithIndex.map { case (r, i) =>
        Row(i.toLong, r._2.orNull, r._3.orNull, r._4.orNull, r._5.orNull)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      val dir = Files.createTempDirectory(s"graft_docstore_prop").toString
      df.write.format("docstore").mode("overwrite").save(dir)
      val back = spark.read.format("docstore").load(dir).collect()
      val expect = df.collect()
      // -0.0 note: JSON "-0.0" parses back to -0.0; Row.equals uses
      // java.lang.Double.equals which distinguishes -0.0 from 0.0 — so a
      // sign-dropping encoder would fail this compare.
      assert(back.map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Long].toString) ===
        expect.map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Long].toString),
        s"seed $seed")
    }
  }
}
