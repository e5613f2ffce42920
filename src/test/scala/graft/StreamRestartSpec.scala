package graft

import java.nio.file.Files
import graft.streaming.EventStreamPipeline
import org.apache.spark.sql.functions._

/** Checkpoint-restart semantics: a drained AvailableNow run, new source
  * files, then a SECOND run against the same checkpoint must process
  * exactly the new files — no reprocessing of the first tranche, no
  * gaps. This is the operational property that makes the sink
  * exactly-once across job restarts (offsets live in the checkpoint,
  * not the process). */
class StreamRestartSpec extends SparkSpecBase {

  test("a restarted stream resumes from the checkpoint: old files are not reprocessed") {
    val events = Tables(spark, "/root/testdata/sf0.001").events
    val src = Files.createTempDirectory("rs_src").toString
    val sink = Files.createTempDirectory("rs_sink").toString
    val ck = Files.createTempDirectory("rs_ck").toString

    val trancheA = events.filter(col("event_id") < 500)
    val trancheB = events.filter(col("event_id") >= 500)

    trancheA.repartition(3).write.mode("append").parquet(src)
    val q1 = EventStreamPipeline.runRouting(spark, src, sink, ck)
    assert(q1.awaitTermination(300000), "first run did not drain within 300s")
    val afterA = spark.read.parquet(sink).count()
    assert(afterA == trancheA.count(), s"first run wrote $afterA of ${trancheA.count()}")

    // "restart": same checkpoint, new files landed in the meantime
    trancheB.repartition(3).write.mode("append").parquet(src)
    val q2 = EventStreamPipeline.runRouting(spark, src, sink, ck)
    assert(q2.awaitTermination(300000), "restarted run did not drain within 300s")

    val out = spark.read.parquet(sink)
    assert(out.count() == events.count(),
      s"restart reprocessed or dropped rows: sink=${out.count()} events=${events.count()}")
    assert(out.select("event_id").distinct().count() == events.count(),
      "duplicate event_ids in the sink after restart")
  }
}
