package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** T4 as a LIVE trigger stream (not just the batch roll-up the
  * t4_health_ticks registry query pins): the health-tick aggregation
  * run under Trigger.AvailableNow over a multi-file source, asserting
  * per-interval (micro-batch) emission and final equality with the
  * batch oracle shape. */
class HealthTickStreamSpec extends SparkSpecBase {

  test("t4 health ticks as a live stream: several micro-batches, final state equals batch") {
    val srcDir = Files.createTempDirectory("ticks_src").toString
    val events = Tables(spark, "/root/testdata/sf0.001").events
    events.repartition(6).write.mode("overwrite").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      // 2 files per micro-batch → the 6-file source needs ≥3 intervals
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir)
      .groupBy(date_trunc("hour", col("ts")).as("tick"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(count(when(col("value") > 100, 1)).cast("double") / count(lit(1)), 6).as("hi_share"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("health_ticks_live")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "tick stream did not drain within 120s")

    // per-interval emission: AvailableNow must have processed the
    // backlog across multiple micro-batches, each a trigger interval
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >=3 non-empty micro-batches, saw $batches")

    val streamed = spark.table("health_ticks_live")
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("tick"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(count(when(col("value") > 100, 1)).cast("double") / count(lit(1)), 6).as("hi_share"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
