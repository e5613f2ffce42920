package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector's STREAMING path: the same
  * deterministic telemetry read via readStream arrives across multiple
  * rate-limited micro-batches, exactly once, equal to the batch read. */
class TelemetryStreamSpec extends SparkSpecBase {

  test("readStream over the V2 connector: rate-limited micro-batches, exactly-once, equals batch") {
    val q = spark.readStream.format("graft.sources.TelemetrySource")
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("telemetry_stream")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }

    // 1000 rows at 300/trigger → 4 non-empty micro-batches
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 4, s"expected >=4 rate-limited micro-batches, saw $batches")

    val streamed = spark.table("telemetry_stream")
    assert(streamed.count() == 1000)
    assert(streamed.select("id").distinct().count() == 1000, "duplicate or missing offsets")

    val batch = spark.read.format("graft.sources.TelemetrySource")
      .option("rows", 1000).option("partitions", 4).load()
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
