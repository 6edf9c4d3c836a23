package org.apache.spark

/** Test-only bridge into `private[spark]` scheduler internals: specs
  * that assert on task metrics (e.g. "the skewed as-of merge never
  * spills") must drain the async listener bus before reading their
  * listener's accumulators, or the assertion races the event queue.
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
