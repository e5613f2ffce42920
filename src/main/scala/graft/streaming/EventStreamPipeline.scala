package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** SURVEY.md §2.9 T1–T5 — the Structured Streaming form of the
  * reference's event-trigger path (/root/reference/containers/
  * orchestrator/orchestrator.py:882-986):
  *
  *   T1 ingestion       → `readStream` file source over event parquet
  *   T2 priority route  → `when` chain producing (sources, timeout)
  *   T3 background sink → `foreachBatch` appending event-keyed results —
  *                        the persistence the reference leaves as a TODO
  *                        (orchestrator.py:978-981)
  *   T4 health ticks    → `Trigger.ProcessingTime` status stream
  *   T5 watermarking    → `withWatermark` + tumbling windows (the
  *                        reference has no event-time handling at all)
  *
  * Scale notes: file-source micro-batches parallelize per file split;
  * the windowed aggregation keeps state per (window, event_type) — tiny
  * key space — and the watermark bounds it. The foreachBatch sink writes
  * partitioned parquet append-only, so re-running a batch after failure
  * is idempotent-by-overwrite at the batch-id level if exactly-once is
  * needed (Spark's default file sink already commits atomically).
  */
object EventStreamPipeline {

  /** Schema of the events stream (matches Tables.events after the ns→µs
    * conversion). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** T2 — the routing transform, shared verbatim between the batch
    * query (`t2_priority_route`) and the stream. Pure column logic:
    * works identically on static and streaming DataFrames. */
  def route(events: DataFrame): DataFrame =
    events
      .withColumn("priority",
        when(col("event_type") === "error", "emergency")
          .when(col("event_type") === "signup", "normal")
          .otherwise("low"))
      .withColumn("sources",
        when(col("priority") === "emergency" || col("event_type") === "signup",
          lit("landfire,modis,weather,topography")).otherwise(lit("weather")))
      .withColumn("timeout_s",
        when(col("priority") === "emergency", 60)
          .when(col("event_type") === "signup", 120)
          .otherwise(30))

  /** T5/W3 — watermarked tumbling-window aggregation; identical logic to
    * the batch `w3_tumbling` query, which is how the spec verifies it. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("avg_value"))

  /** W3 session variant — gap-based session windows per user on the
    * stream (5-minute inactivity gap), watermarked so sessions finalize;
    * identical logic to the batch `w3_session` query. */
  def sessionizedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Streaming entry for session windows. */
  def runSessionized(spark: SparkSession, srcDir: String, sinkDir: String,
                     checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
    sessionizedCounts(stream)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** T-depth — stream-stream interval join: each purchase joins the same
    * user's clicks from the preceding hour. Both sides carry watermarks so
    * Spark derives a state-retention bound from the join's time interval —
    * click state is dropped once the watermark passes click.ts + 1h, which
    * is what keeps two unbounded streams joinable in fixed memory. Pure
    * column logic: identical on static frames (how the spec verifies it). */
  def clickToPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Streaming entry for the interval join. */
  def runIntervalJoin(spark: SparkSession, srcDir: String, sinkDir: String,
                      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir)
    clickToPurchaseJoin(stream)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** T1+T2+T3 — the full event-trigger pipeline: stream events from
    * `srcDir`, route, and append event-keyed collection requests to
    * `sinkDir` via foreachBatch. Returns the running query. */
  def runRouting(spark: SparkSession, srcDir: String, sinkDir: String,
                 checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
    route(stream)
      .select(col("event_id"), col("user_id"), col("priority"),
        col("sources"), col("timeout_s"), col("ts").as("requested_at"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // T3: the event-keyed persistence the reference stubs out
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** T5 — watermarked windowed aggregation as a stream, appending
    * finalized windows to `sinkDir`. */
  def runWindowed(spark: SparkSession, srcDir: String, sinkDir: String,
                  checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
    windowedCounts(stream)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(sinkDir)
      }
      .start()
  }
}
