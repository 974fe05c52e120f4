package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-task write metrics off the Spark scheduler bus (the reference's
  * `core/listener/SparkRecordListener.scala:7-26`): every finished result
  * task contributes (finish time, records written, on-heap execution
  * memory). Complements the `observe()`-based [[RunReport]]: observe
  * counts what flows through the PLAN, this counts what the writer tasks
  * actually COMMITTED — per task, which is what a throughput / memory
  * timeline needs and what a 1000-executor run reports without any extra
  * job. Registration is per-listener-instance on the async bus, so
  * attach/detach brackets one run; [[settled]] absorbs the bus delay.
  */
final class RecordListener extends SparkListener {
  import RecordListener.TaskRecord

  private val buf = scala.collection.mutable.ArrayBuffer.empty[TaskRecord]
  private val t0 = System.currentTimeMillis()

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    if (t.taskType.equalsIgnoreCase("resulttask") && t.taskMetrics != null) synchronized {
      buf += TaskRecord(t.taskInfo.finishTime,
        t.taskMetrics.outputMetrics.recordsWritten,
        t.taskExecutorMetrics.getMetricValue("OnHeapExecutionMemory"))
    }

  def tasks: Seq[TaskRecord] = synchronized(buf.toVector)
  def recordsWritten: Long = tasks.map(_.recordsWritten).sum
  def peakOnHeapExecMem: Long = tasks.foldLeft(0L)((m, t) => math.max(m, t.onHeapExecMem))

  /** Rows/sec from listener attach to the last task finish (0 when no
    * task wrote records or the window is degenerate). */
  def recordsPerSec: Double = {
    val ts = tasks
    if (ts.isEmpty) 0.0
    else {
      val span = (ts.map(_.finishTime).max - t0) / 1000.0
      if (span <= 0) 0.0 else recordsWritten / span
    }
  }

  /** The event bus is async — wait (bounded) until the task count stops
    * moving before reading totals. */
  def settled(maxWaitMs: Long = 2000L): RecordListener = {
    var last = -1
    var seen = synchronized(buf.size)
    val deadline = System.currentTimeMillis() + maxWaitMs
    while (seen != last && System.currentTimeMillis() < deadline) {
      last = seen
      Thread.sleep(50L)
      seen = synchronized(buf.size)
    }
    this
  }
}

object RecordListener {
  final case class TaskRecord(finishTime: Long, recordsWritten: Long, onHeapExecMem: Long)

  /** Attach a fresh listener, run the body, settle and detach; returns
    * (body result, listener with its captured task records). */
  def around[A](spark: org.apache.spark.sql.SparkSession)(body: => A): (A, RecordListener) = {
    val l = new RecordListener
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      (a, l.settled())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
