package graft

import java.nio.file.Files
import graft.streaming.StreamingBurnRate
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** The burn-rate monitor's streaming contract: (1) counters survive a
  * checkpoint restart mid-ingest (no recount, no loss), and (2) the
  * drained bucket census reproduces the registered batch query's burn
  * rows EXACTLY once the trailing-window arithmetic is applied — the
  * property that makes the streamed snapshot a drop-in source for the
  * same alert rule a batch evaluation would fire. */
class StreamingBurnRateSpec extends SparkSpecBase {

  test("restarted burn-rate stream resumes counters and reproduces the batch burn rows") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val src = Files.createTempDirectory("br_src").toString
    val sink = Files.createTempDirectory("br_sink").toString
    val ck = Files.createTempDirectory("br_ck").toString

    events.filter(col("event_id") % 2 === 0).coalesce(2).write.mode("append").parquet(src)
    val q1 = StreamingBurnRate.run(spark, src, sink, ck)
    assert(q1.awaitTermination(120000), "first run did not drain within 120s")

    events.filter(col("event_id") % 2 =!= 0).coalesce(2).write.mode("append").parquet(src)
    val q2 = StreamingBurnRate.run(spark, src, sink, ck)
    assert(q2.awaitTermination(120000), "restarted run did not drain within 120s")

    // final census per bucket = snapshot row with the largest count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n").desc)
    val census = spark.read.parquet(sink)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bucket"), col("n"), col("errs"))

    // apply the batch trailing-window arithmetic over the drained census
    val wLong = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")).rangeBetween(-11, 0)
    val streamed = census
      .withColumn("n_long", sum(col("n")).over(wLong))
      .withColumn("err_long", sum(col("errs")).over(wLong))
      .withColumn("burn_long_bp", expr("err_long * 10000 div n_long"))
      .withColumn("burn_short_bp", expr("errs * 10000 div n"))
      .withColumn("alert", col("burn_long_bp") >= 600 && col("burn_short_bp") >= 600)
      .select(col("bucket"), col("n"), col("errs"), col("n_long"), col("err_long"),
        col("burn_long_bp"), col("burn_short_bp"), col("alert"))

    val batch = QueryRegistry.queries("a13_slo_burn_rate")(spark, dir)
    assert(streamed.count() == batch.count(), "bucket sets diverge")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed burn rows diverge from the registered batch query")
  }
}
