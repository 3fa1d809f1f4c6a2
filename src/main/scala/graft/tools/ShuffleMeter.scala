package graft.tools

/** Shared task-metrics shuffle-write meter for the scratch probes
  * (MicroBench, ScaleProbe) — one copy of the listener + stabilization
  * protocol, so a fix to the drain logic applies to every tool. */
final class ShuffleMeter(sc: org.apache.spark.SparkContext) {
  private val shuffled = new java.util.concurrent.atomic.AtomicLong
  private val inputRecs = new java.util.concurrent.atomic.AtomicLong
  sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inputRecs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
  })

  /** The listener bus is async: wait for the counter to go stable
    * before reading/resetting, or a straggler task from run N lands in
    * run N+1's window and corrupts both numbers. */
  def stable(): Long = {
    var prev = -1L
    var cur = shuffled.get + inputRecs.get
    var waited = 0
    while (cur != prev && waited < 5000) {
      Thread.sleep(100); waited += 100
      prev = cur; cur = shuffled.get + inputRecs.get
    }
    shuffled.get
  }

  /** (wall seconds, shuffle-write bytes) of `f`, straggler-fenced. */
  def measure(f: => Unit): (Double, Long) = {
    stable(); shuffled.set(0L); inputRecs.set(0L)
    val t0 = System.nanoTime()
    f
    ((System.nanoTime() - t0) / 1e9, stable())
  }

  /** Source records read by the last `measure` window — the scan-
    * amplification numerator (reads of a table beyond its row count
    * mean the plan re-materializes a shared subtree). */
  def lastInputRecords: Long = inputRecs.get
}
