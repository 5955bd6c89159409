package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape drift gate (ship_gate step, r12): recomputes every
  * registered query's physical fingerprint and diffs it against the
  * committed prior round's record ([[BenchBaseline]] — the `plans` block
  * Bench embeds beside its timings), printing one PASS/DELTA line per
  * query. An undocumented delta exits non-zero: a broadcast demoting to
  * sort-merge or a new exchange appearing is caught like a bench
  * regression, BEFORE it costs seconds — [[PlanCheck]] would only see it
  * if the flip crossed one of its written invariants.
  *
  * Fingerprints are data-dir dependent (static broadcast thresholds read
  * file sizes), so the gate plans against the SAME sf the baseline was
  * recorded at — sf0.1, the bench corpus — and skips with a loud note if
  * the baseline's sf disagrees.
  */
object PlanDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_FP_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fps = PlanFingerprint.all(spark, sfDir)
    // always dump the fresh fingerprints: seeds the first baseline's
    // `plans` block and gives a FAIL investigation the full current set
    try java.nio.file.Files.write(java.nio.file.Paths.get("plan_fingerprints.json"),
      (fps.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}") + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[plandrift] dump failed: ${e.getMessage}") }
    val base = BenchBaseline.parsed()
    val basePlans = base.flatMap { case (label, node) =>
      val sf = Option(node.get("sf")).map(_.asText()).getOrElse("")
      if (sf != sfDir) {
        println(s"PLANDRIFT SKIP: baseline $label records sf '$sf', gate planned '$sfDir' — no comparable record")
        None
      } else Option(node.get("plans")).map(p => (label, p))
    }

    basePlans match {
      case None =>
        base match {
          case Some((label, _)) if base.exists(b => Option(b._2.get("sf")).exists(_.asText() == sfDir)) =>
            println(s"PLANDRIFT RECORDING: baseline $label has no plans block yet — " +
              "fingerprints will gate once a record with plans is committed")
          case _ => ()
        }
        spark.stop()
      case Some((label, plans)) =>
        var failures = 0
        println(s"PLANDRIFT baseline: $label")
        fps.toSeq.sortBy(_._1).foreach { case (q, fp) =>
          Option(plans.get(q)).map(_.asText()) match {
            case None =>
              // a query added this round has no prior shape to hold —
              // informational; it enters the gate when its record commits
              println(s"NEW   $q: $fp (no baseline entry)")
            case Some(prev) if prev == fp =>
              println(s"PASS  $q: $fp")
            case Some(prev) if PlanFingerprint.expectedDeltas.get(q).exists(_._1 == fp) =>
              println(s"PASS  $q: $prev -> $fp (documented delta: ${PlanFingerprint.expectedDeltas(q)._2})")
            case Some(prev) =>
              failures += 1
              println(s"DELTA $q: $prev -> $fp (undocumented plan flip)")
          }
        }
        println(if (failures == 0) "PLANDRIFT OK" else s"PLANDRIFT $failures UNDOCUMENTED DELTAS")
        spark.stop()
        if (failures > 0) sys.exit(1)
    }
  }
}
