package graft

import java.nio.file.Files
import graft.streaming.StreamingTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The incremental MapState top-k must converge to the batch operator's
  * answer: the last snapshot per key equals TopK.perKey over the same
  * (filtered) events, and the run is genuinely incremental (keys emit
  * multiple snapshots across micro-batches). */
class StreamingTopKSpec extends SparkSpecBase {

  test("streamed MapState top-k converges to the batch top-k operator") {
    val src = Files.createTempDirectory("tk_src").toString
    val events = Tables(spark, "/root/testdata/sf0.001").events
    // range-partition by ts so micro-batches arrive in rough time order
    events.repartitionByRange(6, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(src)

    val sink = Files.createTempDirectory("tk_sink").toString
    val q = StreamingTopK.run(spark, src, sink,
      Files.createTempDirectory("tk_ck").toString)
    assert(q.awaitTermination(300000), "streaming query did not terminate within 300s")

    val snaps = spark.read.parquet(sink)
    val lastSeq = snaps.groupBy("user_id").agg(max("seq").as("seq"))
    val streamed = snaps.join(lastSeq, Seq("user_id", "seq"))
      .select("user_id", "event_id", "value")
      .collect().map(_.toString).toSet

    val batch = graft.ops.TopK.perKey(
        events.filter(col("user_id") < 25),
        Seq("user_id"), Seq(col("value").desc, col("event_id").asc), StreamingTopK.K)
      .select("user_id", "event_id", "value")
      .collect().map(_.toString).toSet

    assert(streamed === batch,
      s"final streamed top-k != batch operator (stream=${streamed.size} batch=${batch.size})")

    // incrementality: with 6 source files at maxFilesPerTrigger=4 there
    // are >= 2 micro-batches, so some key must have re-emitted
    val maxSeq = snaps.agg(max("seq")).head().getLong(0)
    assert(maxSeq >= 2, s"expected multi-batch incremental updates, max seq = $maxSeq")

    // ranks within a snapshot follow (value DESC, event_id ASC)
    val w = Window.partitionBy(col("user_id"), col("seq"))
      .orderBy(col("value").desc, col("event_id").asc)
    val misranked = snaps
      .withColumn("expect", row_number().over(w))
      .filter(col("rank") =!= col("expect")).count()
    assert(misranked == 0, s"$misranked snapshot rows have inconsistent ranks")
  }
}
