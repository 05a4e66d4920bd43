package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev-time per-stage telemetry (enabled via GRAFT_STAGES=1): wall vs summed
  * executor run/CPU time exposes idle-core stages, GC drag, and shuffle
  * volumes — the evidence base for the scaling write-up in BENCH/BASELINE.md.
  */
final class StageMetrics extends SparkListener {
  final case class Row(id: Int, name: String, tasks: Int, wallMs: Long,
                       runMs: Long, cpuMs: Long, gcMs: Long,
                       shufReadMB: Double, shufWriteMB: Double, inputMB: Double)
  val rows = ArrayBuffer.empty[Row]

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val i = sc.stageInfo
    val m = i.taskMetrics
    rows += Row(
      i.stageId,
      i.name.takeWhile(_ != '\n').take(60),
      i.numTasks,
      i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
      m.executorRunTime,
      m.executorCpuTime / 1000000,
      m.jvmGCTime,
      m.shuffleReadMetrics.totalBytesRead / 1e6,
      m.shuffleWriteMetrics.bytesWritten / 1e6,
      m.inputMetrics.bytesRead / 1e6)
  }

  def report(): String = {
    val sb = new StringBuilder
    sb.append("[stages] id tasks wall_s run_s cpu_s gc_s shufR_MB shufW_MB in_MB name\n")
    rows.foreach { r =>
      sb.append(f"[stages] ${r.id}%3d ${r.tasks}%5d ${r.wallMs / 1e3}%6.1f ${r.runMs / 1e3}%6.1f " +
        f"${r.cpuMs / 1e3}%6.1f ${r.gcMs / 1e3}%5.1f ${r.shufReadMB}%8.1f ${r.shufWriteMB}%8.1f " +
        f"${r.inputMB}%8.1f ${r.name}\n")
    }
    sb.toString
  }
}
