package graft

import java.nio.file.Files
import graft.streaming.StreamingEwma
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed EWMA vs the w5_ewma batch query: replay the fixture as four
  * time-ordered micro-batches (the in-order-delivery precondition) and
  * require the drained per-user state to equal the batch fold
  * BIT-FOR-BIT — α = 1/2 makes every step exact, so the comparison is
  * plain equality on doubles, no tolerance. */
class StreamingEwmaSpec extends SparkSpecBase {

  test("time-split streamed EWMA equals the batch fold exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000L) % 1000L, r.getLong(0)))

    // land 4 time-contiguous files; FileStreamSource orders by mod time
    val flat = Files.createTempDirectory("ewma_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"ewma_part$i").toString
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

    val sink = Files.createTempDirectory("ewma_sink").toString
    val q = StreamingEwma.run(spark, flat, sink,
      Files.createTempDirectory("ewma_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val snaps = spark.read.parquet(sink)
    assert(snaps.count() > 0)
    // multiple snapshots per user (one per batch it appeared in): the
    // one with the highest n_events is the drained state
    val finals = snaps.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("ewma"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"), col("m.ewma").as("ewma"))

    val batch = QueryRegistry.queries("w5_ewma")(spark, dir)
    assert(finals.count() == batch.count())
    val mism = finals.join(
        batch.select(col("user_id"), col("n_events").cast("long").as("b_n"),
          col("ewma").as("b_ewma")), "user_id")
      .filter(col("n_events") =!= col("b_n") || col("ewma") =!= col("b_ewma"))
    assert(mism.count() == 0,
      s"streamed EWMA diverged from batch: ${mism.collect().take(3).mkString(", ")}")
  }
}
