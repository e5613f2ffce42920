package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** The engine-side `/metrics` scrape surface — the analog of the
  * reference's Prometheus scrape config over every container
  * (`monitoring/prometheus.yml:15-23`, `/metrics` path): a
  * [[QueryExecutionListener]] that turns each completed query execution
  * into one machine-readable metrics row (label, output rows, wall
  * time, shuffled bytes) that a scraper polls as a table.
  *
  * The row values come from the ENGINE's own instrumentation, not from
  * the driver re-counting results: output rows are read from the
  * executed plan's `numOutputRows` SQLMetric (topmost metered node —
  * the final aggregate for an agg query), shuffled bytes from the sum
  * of every shuffle exchange's `dataSize` metric, wall time from the
  * listener's `durationNs`. Correlation between action and listener
  * event is by a label column planted in the plan itself (an
  * `Alias(Literal(label))` the listener extracts from `qe.analyzed`) —
  * correlation by arrival order or thread-locals is racy because the
  * ExecutionListenerBus delivers asynchronously on the listener-bus
  * thread.
  *
  * Scale shape: the listener is driver-side constant work per QUERY
  * (not per row) — the same cost model as a Prometheus exporter. The
  * scrape table is |queries| rows.
  */
object MetricsScrape {

  val LabelCol = "graft_metrics_label"

  final case class MetricRow(query_label: String, rows_out: Long,
                             wall_ms: Long, shuffle_bytes: Long)

  /** Run each labeled DataFrame to completion under the scrape listener
    * and return the metrics table (one row per query, in label order).
    *
    * AQE is disabled for the scraped runs: AdaptiveSparkPlanExec hides
    * the final plan tree from the listener's plan walk, so the metric
    * extraction would see no metered nodes. (A production scraper on a
    * cluster would read the AQE final plan via the SQLAppStatusStore
    * instead; for the engine-native surface the static plan is the
    * honest, testable form.)
    */
  def run(spark: SparkSession, items: Seq[(String, DataFrame)]): DataFrame = {
    val buf = new java.util.concurrent.ConcurrentHashMap[String, MetricRow]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        labelOf(qe).foreach { lbl =>
          buf.put(lbl,
            MetricRow(lbl, topRows(qe), durationNs / 1000000L, shuffleBytes(qe)))
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.listenerManager.register(listener)
    try {
      items.foreach { case (lbl, df) =>
        df.withColumn(LabelCol, lit(lbl)).collect()
      }
      // ExecutionListenerBus delivery is async; poll for completeness
      // instead of touching the private listener bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (buf.size < items.size && System.nanoTime() < deadline) Thread.sleep(20)
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    val missing = items.map(_._1).filterNot(buf.containsKey)
    require(missing.isEmpty, s"metrics scrape missed: ${missing.mkString(", ")}")
    import spark.implicits._
    items.map { case (lbl, _) => buf.get(lbl) }.toDF()
      .orderBy(col("query_label"))
  }

  /** The label planted by [[run]]: an Alias(Literal) in the analyzed
    * plan's top projection. */
  private def labelOf(qe: QueryExecution): Option[String] =
    qe.analyzed.collectFirst {
      case p: Project if p.projectList.exists(_.name == LabelCol) =>
        p.projectList.collectFirst {
          case a: Alias if a.name == LabelCol =>
            a.child match {
              case l: Literal if l.value != null => Some(l.value.toString)
              case _ => None
            }
        }.flatten
    }.flatten

  /** Output rows of the topmost metered node — for an aggregate query,
    * the final aggregate's numOutputRows. */
  private def topRows(qe: QueryExecution): Long =
    qe.executedPlan.collectFirst {
      case p if p.metrics.contains("numOutputRows") =>
        p.metrics("numOutputRows").value
    }.getOrElse(-1L)

  /** Total bytes through shuffle exchanges (the `dataSize` SQLMetric). */
  private def shuffleBytes(qe: QueryExecution): Long = {
    val sizes = qe.executedPlan.collect {
      // exact match: ShuffleExchangeExec prints as "Exchange";
      // BroadcastExchange also carries dataSize but is not a shuffle
      case p if p.nodeName == "Exchange" && p.metrics.contains("dataSize") =>
        p.metrics("dataSize").value
    }
    if (sizes.isEmpty) 0L else sizes.sum
  }
}
