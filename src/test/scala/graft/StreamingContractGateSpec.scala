package graft

import java.nio.file.Files
import graft.streaming.StreamingContractGate
import org.apache.spark.sql.functions._

/** The ingest-time contract gate's streaming contract: counters survive
  * a checkpoint restart mid-ingest, planted violations in the second
  * tranche are counted exactly once, and the drained per-check census
  * equals a direct batch evaluation of the same predicates over
  * everything ingested. */
class StreamingContractGateSpec extends SparkSpecBase {

  test("restarted contract gate resumes counters and counts planted violations exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val src = Files.createTempDirectory("cg_src").toString
    val sink = Files.createTempDirectory("cg_sink").toString
    val ck = Files.createTempDirectory("cg_ck").toString

    // tranche A: clean fixture rows; tranche B: planted violations
    // (every 7th event gets type 'X', every 11th a negative value)
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 =!= 0)
      .withColumn("event_type",
        when(col("event_id") % 7 === 0, lit("X")).otherwise(col("event_type")))
      .withColumn("value",
        when(col("event_id") % 11 === 0, -col("value") - 1.0).otherwise(col("value")))

    a.coalesce(2).write.mode("append").parquet(src)
    val q1 = StreamingContractGate.run(spark, src, sink, ck)
    assert(q1.awaitTermination(120000), "first run did not drain within 120s")

    b.coalesce(2).write.mode("append").parquet(src)
    val q2 = StreamingContractGate.run(spark, src, sink, ck)
    assert(q2.awaitTermination(120000), "restarted run did not drain within 120s")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("check")).orderBy(col("n_checked").desc)
    val census = spark.read.parquet(sink)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("check"), col("n_checked"), col("n_violations"))

    // batch truth over everything ingested (A clean + B perturbed)
    val all = a.unionByName(b)
    val batch = all.select(
        explode(array(
          struct(lit("accepted_event_type").as("check"),
            col("event_type").isin("click", "view", "purchase", "signup", "error")
              .cast("long").as("ok")),
          struct(lit("value_non_negative").as("check"),
            (col("value") >= 0).cast("long").as("ok")),
          struct(lit("not_null_props").as("check"),
            col("props").isNotNull.cast("long").as("ok")))).as("c"))
      .select(col("c.check").as("check"), col("c.ok").as("ok"))
      .groupBy(col("check"))
      .agg(count(lit(1)).as("n_checked"),
        sum(lit(1L) - col("ok")).as("n_violations"))

    assert(census.count() == 3 && batch.count() == 3)
    val mism = census.alias("s").join(batch.alias("t"), Seq("check"))
      .filter(col("s.n_checked") =!= col("t.n_checked") ||
        col("s.n_violations") =!= col("t.n_violations"))
    assert(mism.count() == 0,
      s"gate counters diverge from batch truth: ${mism.collect().take(3).mkString(", ")}")
    // planted branches actually fired
    val viol = census.filter(col("check") === "accepted_event_type")
      .select(col("n_violations")).head().getLong(0)
    assert(viol > 0, "planted event_type violations were not counted")
  }
}
