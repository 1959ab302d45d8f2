package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Access to `SparkContext.listenerBus` (private[spark]): lets a probe
  * drain the asynchronous listener queue so per-measurement metric
  * captures (task spill counters, peak memory) are complete before the
  * measurement window closes. Same thin-accessor pattern as
  * `org.apache.spark.sql.graftbridge.ColumnBridge`.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses — TimeoutException propagates, a probe must not
    * silently read half-delivered counters). */
  def flush(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
