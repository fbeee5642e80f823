package org.apache.spark

/** Test-only bridge into Spark's private[spark] listener-bus API.
  *
  * ShuffleMetrics needs two guarantees the public API can't give:
  * (1) no queued events from a PRIOR lane's measurement bleed into a
  * freshly added listener, and (2) the reading happens only after every
  * event from THIS lane's jobs has been delivered. `waitUntilEmpty()`
  * provides both deterministically, replacing the old
  * two-equal-reads-100ms-apart polling heuristic that could under-count
  * whenever the async bus stalled longer than the window. */
object GraftBusAccess {
  /** Block until the live listener bus has delivered every queued event. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
