package graft

import java.nio.file.Files
import graft.streaming.StreamingAttribution
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed multi-touch attribution vs the w10_attribution batch query:
  * replay the fixture as four time-ordered micro-batches (the in-order
  * delivery precondition) and require the census of the emitted credit
  * rows — per touch type: touches, distinct purchases, first/last/linear
  * cents — to equal the batch range-join formulation exactly, all
  * integer arithmetic, no tolerance. The two implementations find the
  * 1-hour window by entirely different means (stateful pruned touch
  * lists vs a time-bin hash join), so agreement is a real cross-check. */
class StreamingAttributionSpec extends SparkSpecBase {

  test("time-split streamed attribution equals the batch range-join census exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000L) % 1000L, r.getLong(0)))

    val flat = Files.createTempDirectory("attr_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"attr_part$i").toString
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

    val sink = Files.createTempDirectory("attr_sink").toString
    val q = StreamingAttribution.run(spark, flat, sink,
      Files.createTempDirectory("attr_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val streamed = spark.read.parquet(sink)
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("p_id")).as("n_purchases"),
        sum(col("first_cents")).as("first_cents"),
        sum(col("last_cents")).as("last_cents"),
        sum(col("linear_cents")).as("linear_cents"))

    val batch = QueryRegistry.queries("w10_attribution")(spark, dir)
    assert(streamed.count() == batch.count(),
      "streamed census covers a different touch-type set than the batch query")
    val mism = streamed.alias("s")
      .join(batch.alias("b"), col("s.touch_type") === col("b.touch_type"))
      .filter(col("s.n_touches") =!= col("b.n_touches") ||
        col("s.n_purchases") =!= col("b.n_purchases") ||
        col("s.first_cents") =!= col("b.first_cents") ||
        col("s.last_cents") =!= col("b.last_cents") ||
        col("s.linear_cents") =!= col("b.linear_cents"))
    assert(mism.count() == 0,
      s"streamed attribution diverged from batch: ${mism.collect().take(3).mkString(", ")}")
  }
}
