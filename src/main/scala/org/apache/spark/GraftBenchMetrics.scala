package org.apache.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulation for the bench harness (diagnosing the
  * h09/h04 quiet-run bimodality — round-11 directive #2): sums
  * per-task JVM GC time, shuffle spill bytes, and shuffle fetch-wait
  * across all tasks between two `snapshot()` calls. Lives in
  * `org.apache.spark` because draining the listener bus
  * (`LiveListenerBus.waitUntilEmpty`) — required for per-query
  * attribution, the bus is async — is `private[spark]`. */
class GraftBenchMetrics(sc: SparkContext) extends SparkListener {
  private val gcMs = new AtomicLong
  private val spillBytes = new AtomicLong
  private val fetchWaitMs = new AtomicLong
  private val shufWriteMs = new AtomicLong

  sc.addSparkListener(this)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      gcMs.addAndGet(m.jvmGCTime)
      spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
      shufWriteMs.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000L)
    }
  }

  /** Drain the bus, then return cumulative (gcMs, spillBytes,
    * fetchWaitMs, shuffleWriteMs, drained); callers diff consecutive
    * snapshots. `drained=false` means waitUntilEmpty timed out — events
    * from this timed sample may leak into the next sample's delta, so
    * callers must stamp the artifact rather than silently publish a
    * possibly-misattributed per-sample figure (round-11 ADVICE). */
  def snapshot(): (Long, Long, Long, Long, Boolean) = {
    val drained =
      try { sc.listenerBus.waitUntilEmpty(10000L); true }
      catch { case _: java.util.concurrent.TimeoutException => false }
    (gcMs.get, spillBytes.get, fetchWaitMs.get, shufWriteMs.get, drained)
  }
}
