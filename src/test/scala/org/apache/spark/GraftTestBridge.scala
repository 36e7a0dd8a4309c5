package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * listener bus before reading accumulated task metrics (the shuffle-volume
  * assertions in ScaleSpec would otherwise race event delivery). */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
