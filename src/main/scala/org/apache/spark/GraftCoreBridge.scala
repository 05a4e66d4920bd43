package org.apache.spark

/** Bridge into `private[spark]` core internals (same technique as
  * [[org.apache.spark.sql.GraftBridge]] for the sql side). Exposes only the
  * listener-bus drain the benches need: timing helpers that diff
  * SparkListener-accumulated metrics must wait for async event delivery,
  * and a fixed sleep misattributes late stage-completed events to the next
  * timed run under load.
  */
object GraftCoreBridge {

  /** Block until every event posted to the listener bus so far has been
    * delivered to all listeners, or `timeoutMillis` elapses. Returns true
    * if the bus drained, false on timeout (callers treat the snapshot as
    * best-effort, exactly like the old fixed sleep — but now it is exact
    * whenever the bus keeps up).
    */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
