package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shared per-task skew measurement for the two skew probes
  * ([[SkewProbe]] batch, [[StreamSkewProbe]] streaming) — one
  * definition of the task-end capture, the quiesce discipline, and the
  * heaviest-stage spread math, so a fix to any of them (the median
  * choice, the quiesce deadline) cannot drift between the probes.
  */
object SkewMeter {
  final case class TaskRow(stageId: Int, shuffleReadBytes: Long, durMs: Long)
  final case class Spread(maxOverMedian: Double, maxBytes: Long, tasks: Int,
                          maxDurMs: Long, medianDurMs: Long, totalBytes: Long,
                          plan: String)

  def fmt(s: Spread): String =
    f"max/median task shuffle-read ${s.maxOverMedian}%.1fx (max ${s.maxBytes / 1e6}%.2f MB of ${s.totalBytes / 1e6}%.2f MB over ${s.tasks}%d tasks), straggler ${s.maxDurMs}%d ms vs median ${s.medianDurMs}%d ms"
}

final class SkewMeter(spark: SparkSession) {
  import SkewMeter._

  private val tasks = new ConcurrentLinkedQueue[TaskRow]()
  private val lastTaskEndNs = new AtomicLong(System.nanoTime())
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) tasks.add(TaskRow(te.stageId,
        m.shuffleReadMetrics.totalBytesRead,
        if (te.taskInfo == null) 0L else te.taskInfo.duration))
      lastTaskEndNs.set(System.nanoTime())
    }
  })

  def clear(): Unit = tasks.clear()

  /** Wait for TASK-EVENT QUIESCENCE (no task-end for 1 s, 10 s cap —
    * Probe's awaitStageQuiescence pattern) before reading the queue.
    * The listener bus is async, and on a loaded VM it can deliver the
    * hot task's end late — the straggler is exactly the event the
    * spread assertions need.
    */
  def quiesce(): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline &&
           System.nanoTime() - lastTaskEndNs.get() < 1000L * 1000 * 1000)
      Thread.sleep(100)
  }

  /** Per-task profile of the heaviest shuffle-reading stage captured
    * since [[clear]] — for these probes, the join/window stage of a
    * batch query or the stateful stage of a streaming query's biggest
    * micro-batch.
    */
  def spread(plan: String = ""): Spread = {
    quiesce()
    val byStage = tasks.asScala.toSeq.groupBy(_.stageId)
      .filter(_._2.map(_.shuffleReadBytes).sum > 0)
    if (byStage.isEmpty) Spread(1.0, 0L, 0, 0L, 0L, 0L, plan)
    else {
      val (_, rows) = byStage.maxBy(_._2.map(_.shuffleReadBytes).sum)
      val bytes = rows.map(_.shuffleReadBytes).sorted
      val durs = rows.map(_.durMs).sorted
      val median = math.max(1L, bytes(bytes.size / 2))
      Spread(bytes.last.toDouble / median, bytes.last, bytes.size,
        durs.last, math.max(1L, durs(durs.size / 2)), bytes.sum, plan)
    }
  }
}
