package graft

import java.nio.file.Files
import graft.streaming.StatefulEventTracker
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState tracker: the FINAL snapshot per user (the
  * last micro-batch's emission) must equal the batch aggregate over the
  * same data — custom state arrives at the same truth as stateless
  * aggregation once the stream drains. */
class StatefulTrackerSpec extends SparkSpecBase {

  test("final per-user state snapshot equals the batch aggregate") {
    val src = Files.createTempDirectory("st_src").toString
    val events = Tables(spark, "/root/testdata/sf0.001").events
    events.repartition(6).write.mode("overwrite").parquet(src)

    val sink = Files.createTempDirectory("st_sink").toString
    val q = StatefulEventTracker.run(spark, src, sink,
      Files.createTempDirectory("st_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    // latest snapshot per user = the one with max n_events (monotone)
    val snaps = spark.read.parquet(sink)
    val latest = snaps.groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
    val batch = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))

    val mismatches = latest.join(batch.withColumnRenamed("n_events", "b_n"), "user_id")
      .filter(col("n_events") =!= col("b_n")).count()
    assert(mismatches == 0)
    assert(latest.count() == batch.count())

    // sums agree too (rounded in the tracker)
    val latestSum = snaps.groupBy("user_id").agg(max(col("sum_value")).as("s"))
    val batchSum = events.groupBy("user_id")
      .agg((round(sum(col("value")), 2)).as("bs"))
    val sumMism = latestSum.join(batchSum, "user_id")
      .filter(abs(col("s") - col("bs")) > 0.05).count() // tolerance: per-batch rounding drift
    assert(sumMism == 0)
  }
}
