package graft

import java.nio.file.Files
import graft.streaming.StreamingScd2
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed SCD Type-2 construction vs the u5_scd2_history batch query:
  * replay the fixture as four time-ordered micro-batches (the in-order
  * delivery precondition) and require the emitted CLOSED intervals to
  * equal the batch query's closed rows exactly — same (user, version,
  * type, from, to) tuples, microsecond for microsecond. The batch
  * query's open rows (valid_to_us = -1) are each user's live state, not
  * yet emitted — so the split is also checked: closed + open = full
  * history, one open row per user with history. */
class StreamingScd2Spec extends SparkSpecBase {

  test("time-split streamed SCD2 intervals equal the batch history's closed rows") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type")
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000L) % 1000L, r.getLong(0)))

    val flat = Files.createTempDirectory("scd2_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"scd2_part$i").toString
      slice.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
        .toSeq.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val f = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(flat, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }

    val sink = Files.createTempDirectory("scd2_sink").toString
    val q = StreamingScd2.run(spark, flat, sink,
      Files.createTempDirectory("scd2_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val batch = QueryRegistry.queries("u5_scd2_history")(spark, dir).cache()
    val closedBatch = batch.filter(col("valid_to_us") =!= -1L)
      .select("user_id", "version", "event_type", "valid_from_us", "valid_to_us")
    val streamed = spark.read.parquet(sink)
      .select("user_id", "version", "event_type", "valid_from_us", "valid_to_us")

    assert(streamed.count() == closedBatch.count(),
      s"closed-interval counts differ: stream=${streamed.count()} batch=${closedBatch.count()}")
    assert(streamed.exceptAll(closedBatch).isEmpty && closedBatch.exceptAll(streamed).isEmpty,
      "streamed closed intervals are not exactly the batch history's closed rows")

    // the open tail: exactly one open row per user with history, and
    // closed + open partitions the full batch history
    val openBatch = batch.filter(col("valid_to_us") === -1L)
    assert(openBatch.count() == batch.select("user_id").distinct().count(),
      "expected exactly one open interval per user")
    assert(closedBatch.count() + openBatch.count() == batch.count())
  }
}
