package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming arm of the dedup family (A10 ⊕): exact duplicate
  * suppression on an unbounded stream via dropDuplicatesWithinWatermark —
  * state for a key is held only until the watermark passes its event
  * time + delay, which is what bounds dedup state on an infinite stream
  * (the batch dropDuplicates would accumulate every key forever).
  */
class StreamingDedupSpec extends SparkSpecBase {

  test("streaming dropDuplicatesWithinWatermark suppresses same-key re-deliveries") {
    val src = Files.createTempDirectory("sd_src").toString
    // events fixture with every row delivered twice (at-least-once
    // delivery): the streaming dedup must restore exactly-once
    val events = Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    events.union(events).repartition(8).write.mode("overwrite").parquet(src)

    val sink = Files.createTempDirectory("sd_sink").toString
    val q = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("sd_ck").toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", sink)
      .outputMode("append")
      .start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val out = spark.read.parquet(sink)
    val nDistinct = events.select("event_id").distinct().count()
    // no event_id may appear twice, and (modulo rows held back by the
    // final watermark) the distinct universe must be preserved
    assert(out.groupBy("event_id").count().filter(col("count") > 1).count() == 0,
      "a duplicate event_id survived streaming dedup")
    val emitted = out.select("event_id").distinct().count()
    assert(emitted == nDistinct,
      s"streaming dedup emitted $emitted of $nDistinct distinct keys")
  }
}
