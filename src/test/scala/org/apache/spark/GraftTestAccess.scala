package org.apache.spark

/** Test-only bridge into `private[spark]` surface: draining the async
  * listener bus so job-count assertions read a settled counter.
  */
object GraftTestAccess {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
