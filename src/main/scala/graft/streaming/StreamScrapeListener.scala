package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming side of the engine's `/metrics` scrape surface
  * ([[graft.ops.MetricsScrape]] is the batch side; the reference scrapes
  * a Prometheus `/metrics` path on every container,
  * monitoring/prometheus.yml:15-23): a [[StreamingQueryListener]] that
  * accumulates ONE metrics row per micro-batch progress event — query
  * name, batch id, input rows, trigger wall ms — into a bounded
  * in-memory buffer a scraper polls as a table.
  *
  * Driver-side constant work per micro-batch (the exporter cost model);
  * nothing touches the data plane. Registered around the serving
  * pipeline in ServingPipelineSpec, which asserts both stages' rows
  * land with the row counts the pipeline actually processed.
  */
object StreamScrapeListener {
  final case class ProgressRow(query_name: String, batch_id: Long,
                               input_rows: Long, trigger_ms: Long)
}

final class StreamScrapeListener extends StreamingQueryListener {
  import StreamScrapeListener.ProgressRow

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[ProgressRow]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.add(ProgressRow(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def rows: Seq[ProgressRow] = {
    val b = Seq.newBuilder[ProgressRow]
    buf.forEach(r => b += r)
    b.result()
  }

  /** The scrape table. */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }
}
