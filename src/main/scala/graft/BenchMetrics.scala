package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-byte accounting for the scale benches: wall-clock alone hides
  * whether a "faster" plan got faster by moving fewer bytes or by winning
  * scheduler luck, and bytes-through-the-exchange is the number that
  * extrapolates to a 1000-executor cluster (wall time on local[32] does
  * not). Snapshot before a run, diff after.
  */
final class BenchMetrics extends SparkListener {
  private val shuffleWrite = new AtomicLong()
  private val shuffleRead = new AtomicLong()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  /** (shuffle bytes written, shuffle bytes read) so far. Listener delivery
    * is async: callers sleep briefly after the last action before diffing —
    * fine for a bench printout, not a correctness surface.
    */
  def snapshot(): (Long, Long) = (shuffleWrite.get(), shuffleRead.get())
}

object BenchMetrics {
  def install(sc: SparkContext): BenchMetrics = {
    val m = new BenchMetrics
    sc.addSparkListener(m)
    m
  }

  /** Run `body`, return (result, wallSecs, shuffleWriteDelta, shuffleReadDelta). */
  def timedWithShuffle[T](m: BenchMetrics)(body: => T): (T, Double, Long, Long) = {
    val (w0, r0) = m.snapshot()
    val t0 = System.nanoTime()
    val res = body
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800) // let async listener events drain
    val (w1, r1) = m.snapshot()
    (res, secs, w1 - w0, r1 - r0)
  }
}
