package graft

import java.nio.file.Files
import graft.streaming.StreamingRetention
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed retention cohorts vs the w7_retention_cohorts batch query:
  * replay the fixture as four time-ordered micro-batches, reconstruct
  * the cohort×age triangle from the drained 16-byte-per-user bitmask
  * snapshots, and require exact equality with the batch distinct-count
  * triangle — all integer counts. */
class StreamingRetentionSpec extends SparkSpecBase {

  test("time-split streamed retention triangle equals the batch query exactly") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000L) % 1000L, r.getLong(0)))

    val flat = Files.createTempDirectory("ret_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"ret_part$i").toString
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

    val sink = Files.createTempDirectory("ret_sink").toString
    val q = StreamingRetention.run(spark, flat, sink,
      Files.createTempDirectory("ret_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    // drained state: masks are monotone (bits only accumulate), so
    // max(mask) per user is the final snapshot
    val finals = spark.read.parquet(sink)
      .groupBy(col("user_id"))
      .agg(min(col("cohort_day")).as("cohort_day"), max(col("mask")).as("mask"))
    // triangle: explode set ages out of each mask
    val streamed = finals
      .select(col("user_id"), col("cohort_day"), col("mask"),
        explode(sequence(lit(0), lit(63))).as("age_days"))
      .filter(expr("(shiftright(mask, cast(age_days AS int)) & 1) = 1"))
      .groupBy(
        date_format(expr("date_add(DATE'1970-01-01', cast(cohort_day as int))"),
          "yyyy-MM-dd").as("cohort"),
        col("age_days").cast("int").as("age_days"))
      .agg(count_distinct(col("user_id")).as("n_active"))
    val batch = QueryRegistry.queries("w7_retention_cohorts")(spark, dir)
      .select(col("cohort"), col("age_days").cast("int").as("age_days"),
        col("n_active"))

    assert(streamed.count() == batch.count())
    val mism = streamed.withColumnRenamed("n_active", "s_active")
      .join(batch, Seq("cohort", "age_days"), "full_outer")
      .filter(col("s_active").isNull || col("n_active").isNull ||
        col("s_active") =!= col("n_active"))
    assert(mism.count() == 0,
      s"streamed triangle diverged: ${mism.collect().take(3).mkString(", ")}")
  }
}
