package graft

/** Accumulates shuffle WRITE bytes across completed stages — the
  * data-plane counterpart of a wall-clock ratio. A query whose time
  * ratio looks flat because fixed overhead amortizes still shows its
  * true data growth here; a hidden quadratic intermediate shows a
  * ~100x byte ratio even when its time hides inside host noise.
  * Listener events are async: read the counter via [[settle]]. */
class ShuffleTally extends org.apache.spark.scheduler.SparkListener {
  val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)

  /** Let in-flight listener events drain, then read the counter. */
  def settle(): Long = { Thread.sleep(300); bytes.get() }
}
