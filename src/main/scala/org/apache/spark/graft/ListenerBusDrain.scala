package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for graft.Bench's per-query task-metrics
  * attribution. `SparkContext.listenerBus.waitUntilEmpty()` is private[spark],
  * hence this one-method bridge in the spark package. Without a drain the
  * async bus leaks a fast query's task-end events into the NEXT query's
  * counter delta (measured in the first metrics window: q01's ~200 MB
  * lineitem scan attributed 0.0 MB, the backlog absorbed by the next query
  * slow enough for the bus to catch up under). Bench instrumentation only —
  * no engine code path touches this.
  */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
