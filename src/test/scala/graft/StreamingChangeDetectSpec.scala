package graft

import java.nio.file.Files
import graft.streaming.StreamingChangeDetect
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed change detection vs the w8_change_detect batch query: replay
  * the fixture as four time-ordered micro-batches (the in-order-delivery
  * precondition) and require the per-type census of the emitted
  * transition stream to equal the batch lag()-window census exactly —
  * all integer counts, no tolerance. Also pins the per-event guarantee
  * the census can't see: exactly one output row per input event. */
class StreamingChangeDetectSpec extends SparkSpecBase {

  test("time-split streamed change detection equals the batch census exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000L) % 1000L, r.getLong(0)))

    // land 4 time-contiguous files; FileStreamSource orders by mod time
    val flat = Files.createTempDirectory("chg_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"chg_part$i").toString
      slice.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
        .toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val f = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(flat, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }

    val sink = Files.createTempDirectory("chg_sink").toString
    val q = StreamingChangeDetect.run(spark, flat, sink,
      Files.createTempDirectory("chg_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val out = spark.read.parquet(sink)
    // exactly one flagged row per input event, every event accounted for
    assert(out.count() == events.length)
    assert(out.select("event_id").distinct().count() == events.length)

    val streamed = out.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("changed"), 1)).as("n_changes"),
        count(when(!col("changed"), 1)).as("n_repeats"))
    val batch = QueryRegistry.queries("w8_change_detect")(spark, dir)
    val mism = streamed.join(batch.withColumnRenamed("n_events", "b_events")
        .withColumnRenamed("n_changes", "b_changes")
        .withColumnRenamed("n_repeats", "b_repeats"), "event_type")
      .filter(col("n_events") =!= col("b_events") ||
        col("n_changes") =!= col("b_changes") || col("n_repeats") =!= col("b_repeats"))
    assert(streamed.count() == batch.count())
    assert(mism.count() == 0,
      s"streamed census diverged from batch: ${mism.collect().take(3).mkString(", ")}")
  }
}
