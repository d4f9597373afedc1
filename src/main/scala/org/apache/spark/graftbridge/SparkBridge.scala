package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Accessors for `private[spark]` internals the engine needs. */
object SparkBridge {
  /** Block until the async listener bus has delivered all queued events —
   *  needed to read task metrics right after a job completes. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
