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
final class BenchMetrics(sc: SparkContext) extends SparkListener {
  private val shuffleWrite = new AtomicLong()
  private val shuffleRead = new AtomicLong()

  /** Wait (bounded) for the async listener bus to deliver everything posted
    * so far, so a snapshot taken right after an action sees that action's
    * stages — a fixed sleep misattributed late events to the NEXT timed run
    * under load.
    */
  def drain(timeoutMillis: Long = 10000L): Boolean =
    org.apache.spark.GraftCoreBridge.drainListenerBus(sc, timeoutMillis)

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  /** (shuffle bytes written, shuffle bytes read) so far. Listener delivery
    * is async: callers [[drain]] after the last action before diffing —
    * a bench printout surface, not a correctness one.
    */
  def snapshot(): (Long, Long) = (shuffleWrite.get(), shuffleRead.get())
}

object BenchMetrics {
  def install(sc: SparkContext): BenchMetrics = {
    val m = new BenchMetrics(sc)
    sc.addSparkListener(m)
    m
  }

  /** Run `body`, return (result, wallSecs, shuffleWriteDelta, shuffleReadDelta). */
  def timedWithShuffle[T](m: BenchMetrics)(body: => T): (T, Double, Long, Long) = {
    m.drain()
    val (w0, r0) = m.snapshot()
    val t0 = System.nanoTime()
    val res = body
    val secs = (System.nanoTime() - t0) / 1e9
    m.drain()
    val (w1, r1) = m.snapshot()
    (res, secs, w1 - w0, r1 - r0)
  }
}
