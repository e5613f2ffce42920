package graft

import java.nio.file.Files
import graft.streaming.StreamingCountMin
import org.apache.spark.sql.functions._

/** The streamed Count-Min sketch's contract: counters survive a
  * checkpoint restart mid-ingest, and the drained cell census equals
  * the batch-built sketch bit-for-bit — increments are commutative, so
  * the split/restart ingest order must not matter. With the sketches
  * equal, every point-frequency estimate (min over the 4 rows) is
  * equal too, so the batch certification (a11_countmin_sketch) covers
  * the streamed sketch's answers. */
class StreamingCountMinSpec extends SparkSpecBase {

  test("restarted count-min stream reproduces the batch sketch exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val src = Files.createTempDirectory("cm_src").toString
    val sink = Files.createTempDirectory("cm_sink").toString
    val ck = Files.createTempDirectory("cm_ck").toString

    events.filter(col("event_id") % 2 === 0).coalesce(2).write.mode("append").parquet(src)
    val q1 = StreamingCountMin.run(spark, src, sink, ck)
    assert(q1.awaitTermination(120000), "first run did not drain within 120s")

    events.filter(col("event_id") % 2 =!= 0).coalesce(2).write.mode("append").parquet(src)
    val q2 = StreamingCountMin.run(spark, src, sink, ck)
    assert(q2.awaitTermination(120000), "restarted run did not drain within 120s")

    // final census per cell = snapshot row with the largest count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("j"), col("b")).orderBy(col("cnt").desc)
    val streamed = spark.read.parquet(sink)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("j"), col("b"), col("cnt"))

    // batch sketch with the same hash family
    val batch = {
      val cells = (0 until 4).map { j =>
        struct(lit(j.toLong).as("j"), expr(
          s"(((user_id % 1000003L) * ${StreamingCountMin.A(j)}L + ${StreamingCountMin.B(j)}L) % 1000003L) % ${StreamingCountMin.W}")
          .as("b"))
      }
      events.select(explode(array(cells: _*)).as("h"))
        .select(col("h.j"), col("h.b"))
        .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
    }
    assert(streamed.count() == batch.count(), "cell sets diverge")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed count-min counters diverge from the batch sketch")
  }
}
