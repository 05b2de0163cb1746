package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench support: deterministically drain the async listener bus so
  * per-query shuffle/spill deltas are attributed to the query that
  * produced them, not to whichever query reads the counters next. The
  * bus and its `waitUntilEmpty` are `private[spark]`, hence this shim
  * lives under the org.apache.spark package — it is the supported
  * test-utility surface (Spark's own test harness drains the same way),
  * not reflection or internals-copying.
  */
object ListenerDrain {
  /** Block until every queued listener event is dispatched, or
    * `timeoutMs` passes (on timeout we proceed: a late event only
    * shifts a few diagnostic MB between adjacent queries).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
