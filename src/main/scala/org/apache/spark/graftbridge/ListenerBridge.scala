package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Package-private bridge (the repo's standard Spark-4 device, see
  * `sql/graftbridge`): `SparkContext.listenerBus` is `private[spark]`, and
  * benchmarking needs to DRAIN it — listener events are delivered async,
  * so per-query task-metric totals read before the bus is empty would
  * attribute a query's tail tasks to the next query's row.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
