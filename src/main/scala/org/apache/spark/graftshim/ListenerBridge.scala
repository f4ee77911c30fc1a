package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; the bench harness needs
  * `waitUntilEmpty()` so per-query task-metric snapshots are complete
  * before being read (listener events are delivered asynchronously).
  * Same compiled-into-the-namespace pattern as
  * [[org.apache.spark.sql.graftshim.ColumnBridge]]; nothing is modified.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
