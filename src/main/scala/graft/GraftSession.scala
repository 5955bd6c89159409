package graft

import org.apache.spark.sql.SparkSession

/** The ONE SparkSession configuration for every runtime surface whose
  * plans must be the benched plans (Bench, Verify, PlanDump, Probe).
  * Previously each main hand-duplicated the config block, so a drift in
  * one — a forgotten extension, a different FS impl — would silently make
  * captured plans stop matching benched plans (r17 advisory).
  *
  * Core count comes from SPARK_GRAFT_CPUS: the driver ALSO runs the bench
  * at a lower core count to measure per-query scaling, so a hard-coded
  * master would ruin that measurement.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  def sfDir: String = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def builder(nCpus: String = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$nCpus]")
      .config("spark.sql.shuffle.partitions", nCpus)
      // Tables.events's NTZ branch is only an identity cast because the
      // session timezone is UTC — a non-UTC host would shift every ts.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false") // ICU clinit costs minutes; JVM case mapping ≡ ICU on ASCII
      .config("spark.local.dir", "/dev/shm/spark-local") // shuffle scratch on tmpfs: file create/mmap on this VM disk costs ms
      .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFileSystem") // no-fork chmod: see FastLocalFileSystem
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Build the session and set the shared log level. */
  def open(nCpus: String = cpus): SparkSession = {
    val s = builder(nCpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
