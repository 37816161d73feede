package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only accessor for the listener bus's package-private
  * `waitUntilEmpty` (the same hook Spark's own test harness uses to make
  * listener-derived metrics deterministic). The bench attributes
  * task-end spill/GC metrics to per-query windows; without a drain the
  * async dispatch can bleed a query's last events into the next window.
  * Lives under `org.apache.spark` solely to see the private[spark]
  * member — no Spark internals are modified.
  */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
