package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue

// throwaway measurement scratch — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFileSystem")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    Bench.run(SparkEntry.queries("a14_scalar_stats")(spark, d))

    case class St(id: Int, name: String, tasks: Int, ms: Long, submitted: Long)
    val stages = new ConcurrentLinkedQueue[St]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks, dur,
          si.submissionTime.getOrElse(0L)))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (i <- 1 to 2) {
      stages.clear()
      val t0 = System.nanoTime()
      Bench.run(SparkEntry.queries("ir_prf_expansion")(spark, d))
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(_.submitted)
      println(f"IRPRF pass$i total=$dt%.2f stages=${ss.size} tasks=${ss.map(_.tasks).sum} stageMsSum=${ss.map(_.ms).sum}")
      if (i == 2) {
        // gaps between consecutive stages = driver/AQE think time
        val gaps = ss.sliding(2).collect { case Seq(a, b) =>
          b.submitted - (a.submitted + a.ms) }.toSeq
        println(s"IRPRF gapsMs=${gaps.sorted.reverse.take(12)}  gapSum=${gaps.filter(_ > 0).sum}")
        ss.sortBy(-_.ms).take(12).foreach(s => println(f"  STAGE ${s.ms}%5d ms  t=${s.tasks}%3d  ${s.name}"))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
