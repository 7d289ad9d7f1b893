package org.apache.spark.sql

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain.
  *
  * Listener events are delivered asynchronously; a benchmark that
  * snapshots per-query metrics right after the query's action returns
  * would race the bus and attribute late task-end events to the NEXT
  * query. `waitUntilEmpty` is the supported way Spark's own test
  * utilities serialize on delivery, but it is package-private — this
  * one-line shim (compiled into the Spark package namespace, same
  * technique as [[GraftSqlBridge]]) re-exports it.
  */
object GraftListenerBridge {
  /** Block until every posted listener event has been delivered (bounded
    * by the bus's internal 10 s timeout — a timeout degrades metric
    * attribution, never correctness, so it is swallowed).
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }
}
