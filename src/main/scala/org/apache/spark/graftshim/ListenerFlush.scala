package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to
  * drain it so per-query task-metric snapshots (BENCH_DIAG.json) don't
  * attribute one query's straggler TaskEnd events to the next query.
  * Same minimal-shim technique as sql/graft/bridge.scala.
  */
object GraftListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
