package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run on a small thread pool — Spark schedules concurrent jobs
  * from one session safely, and at sf0.01 per-query time is dominated by
  * planning/codegen latency, not executor capacity, so 4-way overlap cuts
  * the wall time ~3×. Failures print loudly (round-1 lesson: a swallowed
  * parquet type error silently dropped 37 queries from the gate).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional extra args: run only these queries (local iteration aid;
    // the driver always runs the full set)
    val only = args.drop(2).toSet
    val spark = GraftSession.open()
    new java.io.File(outDir).mkdirs()

    val nFailed = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(4)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            nFailed.incrementAndGet()
            System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
          }
      })
    }
    pool.shutdown()
    // A timeout here (VM stall windows are a documented hazard) must be
    // LOUD: the in-flight queries' outputs will be missing, and a silent
    // fall-through would hand check_oracle an incomplete dump. (The
    // missing-dir check there is the second line of defense.)
    if (!pool.awaitTermination(2, TimeUnit.HOURS)) {
      nFailed.incrementAndGet()
      System.err.println(
        "[verify] POOL TIMEOUT after 2h — in-flight queries killed, their outputs are MISSING")
    }
    if (nFailed.get > 0)
      System.err.println(s"[verify] ${nFailed.get} queries FAILED — outputs missing")

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
