package graft

import java.nio.file.Files
import graft.streaming.UserTotalsTWS
import org.apache.spark.sql.functions._

/** transformWithState tracker: snapshots and timer-driven finals must
  * agree with the batch aggregate over the same data — the new
  * arbitrary-state API arrives at the same truth as stateless
  * aggregation once the stream drains. */
class UserTotalsTWSSpec extends SparkSpecBase {

  test("TWS snapshots match batch aggregate; idle keys emit exactly one final") {
    val src = Files.createTempDirectory("tws_src").toString
    val events = Tables(spark, "/root/testdata/sf0.001").events
    events.repartition(6).write.mode("overwrite").parquet(src)

    val sink = Files.createTempDirectory("tws_sink").toString
    val q = UserTotalsTWS.run(spark, src, sink,
      Files.createTempDirectory("tws_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val out = spark.read.parquet(sink)
    val batch = events.groupBy("user_id").agg(
      count(lit(1)).as("b_n"),
      round(sum(col("value")), 2).as("b_sum"),
      max(unix_millis(col("ts").cast("timestamp"))).as("b_last"))

    // latest snapshot per user equals the batch aggregate
    val latest = out.filter(col("kind") === "snapshot")
      .groupBy("user_id").agg(max(col("n_events")).as("n_events"))
    assert(latest.count() == batch.count())
    assert(latest.join(batch, "user_id")
      .filter(col("n_events") =!= col("b_n")).count() == 0)

    // finals: at most one per user, and every final carries the full totals
    val finals = out.filter(col("kind") === "final")
    val dupFinals = finals.groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dupFinals == 0)
    val badFinals = finals.join(batch, "user_id")
      .filter(col("n_events") =!= col("b_n") ||
        abs(col("sum_value") - col("b_sum")) > 0.05 ||
        col("last_ms") =!= col("b_last")).count()
    assert(badFinals == 0, "a final row diverged from the batch totals")

    // eviction rule: a user idle past the final watermark MUST have a
    // final row. Final watermark = max(ts) - 1h delay; timer fires once
    // watermark passes last_ms + IdleGapMs.
    val wmMs = events.agg(max(unix_millis(col("ts").cast("timestamp"))))
      .head().getLong(0) - 3600000L
    val mustEvict = batch.filter(col("b_last") + UserTotalsTWS.IdleGapMs < wmMs)
    val missing = mustEvict.join(finals, Seq("user_id"), "left_anti").count()
    assert(missing == 0, s"$missing idle users were never evicted")
  }
}
