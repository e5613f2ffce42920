package graft

import java.nio.file.Files
import graft.streaming.EventStreamPipeline
import org.apache.spark.sql.functions._

/** Drives the real Structured Streaming pipeline (readStream → route /
  * watermark+window → foreachBatch sink) over the sf0.001 events fixture
  * and asserts the streamed result equals the batch plan on the same
  * data — the equivalence Structured Streaming guarantees for complete
  * append-only inputs. */
class EventStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val srcDir: String = {
    // Re-materialize events with µs timestamps (the raw fixture is
    // TIMESTAMP(NANOS), which the stream source schema can't read).
    val dir = tmp("events_src")
    Tables(spark, "/root/testdata/sf0.001").events
      .repartition(8) // several files → several micro-batches with maxFilesPerTrigger=4
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("T1-T3: routing stream lands every event exactly once with correct routing") {
    val sink = tmp("route_sink")
    val q = EventStreamPipeline.runRouting(spark, srcDir, sink, tmp("route_ck"))
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val out = spark.read.parquet(sink)
    val batch = EventStreamPipeline.route(Tables(spark, "/root/testdata/sf0.001").events)

    assert(out.count() == batch.count()) // every event, exactly once
    assert(out.select("event_id").distinct().count() == out.count())
    // routing semantics survive the stream boundary
    val mism = out.join(
      batch.select(col("event_id"), col("sources").as("b_sources"), col("timeout_s").as("b_timeout")),
      "event_id")
      .filter(col("sources") =!= col("b_sources") || col("timeout_s") =!= col("b_timeout"))
      .count()
    assert(mism == 0)
    // emergency routing gets all four sources and the 60s budget
    val emer = out.filter(col("priority") === "emergency")
    assert(emer.count() > 0)
    assert(emer.filter(col("sources") =!= "landfire,modis,weather,topography" ||
      col("timeout_s") =!= 60).count() == 0)
  }

  test("§3.3: streamed event-collect equals the batch composition and respects routing") {
    val sink = tmp("ec_sink")
    val q = EventStreamPipeline.runEventCollect(spark, srcDir, sink, tmp("ec_ck"))
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val events = Tables(spark, "/root/testdata/sf0.001").events
    val streamed = spark.read.parquet(sink).drop("batch_id")
    val batch = EventStreamPipeline.collectForEvents(events)

    // the streamed micro-batched dispatch produces EXACTLY the batch rows
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // weather-only ("updated") routes must come back weather-only
    val low = streamed.filter(col("priority") === "low")
    assert(low.count() > 0)
    assert(low.filter(col("landfire").isNotNull || col("modis").isNotNull ||
      col("topography").isNotNull).count() == 0)
    assert(low.filter(col("sources_successful") =!= 1 || col("weather").isNull).count() == 0)
    // emergency routes carry all four sources
    val emer = streamed.filter(col("priority") === "emergency")
    assert(emer.count() > 0)
    assert(emer.filter(col("sources_successful") =!= 4).count() == 0)
    // the off-box slice (every 19th event) is rejected upstream of the sink
    assert(streamed.filter(pmod(col("event_id"), lit(19)) === 0).count() == 0)
    assert(batch.count() < events.count())
  }

  test("W3 sessions: streamed session windows match batch session_window on finalized sessions") {
    val sink = tmp("sess_sink")
    val q = EventStreamPipeline.runSessionized(spark, srcDir, sink, tmp("sess_ck"))
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val streamed = spark.read.parquet(sink)
    val batch = EventStreamPipeline.sessionizedCounts(
      Tables(spark, "/root/testdata/sf0.001").events)
    val joined = streamed.join(
      batch.withColumnRenamed("n_events", "b_n").withColumnRenamed("sum_value", "b_sum"),
      Seq("session_start", "user_id"), "left")
    assert(streamed.count() > 0)
    assert(joined.filter(col("b_n").isNull).count() == 0) // nothing fabricated
    assert(joined.filter(col("n_events") =!= col("b_n") || col("sum_value") =!= col("b_sum")).count() == 0)
  }

  test("W3 hopping: streamed overlapping windows match batch on finalized windows") {
    val sink = tmp("hop_sink")
    val q = EventStreamPipeline.runHopping(spark, srcDir, sink, tmp("hop_ck"))
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val streamed = spark.read.parquet(sink)
    val batch = EventStreamPipeline.hoppingCounts(
      Tables(spark, "/root/testdata/sf0.001").events)
    val joined = streamed.join(
      batch.withColumnRenamed("n", "b_n").withColumnRenamed("sum_cents", "b_sum"),
      Seq("win_start", "event_type"), "left")
    assert(streamed.count() > 0)
    assert(joined.filter(col("b_n").isNull).count() == 0) // nothing fabricated
    assert(joined.filter(col("n") =!= col("b_n") || col("sum_cents") =!= col("b_sum")).count() == 0)
    // No finalized-fraction threshold: HOW MANY windows the watermark
    // closes depends on micro-batch file grouping (maxFilesPerTrigger)
    // and the fixture's time span — a threshold on it flakes rather
    // than signals (ADVICE r8). Emission correctness is fully pinned by
    // count > 0 + the exact-match join above.
  }

  test("T5/W3: watermarked windowed stream equals the batch windowed aggregation") {
    val sink = tmp("win_sink")
    val q = EventStreamPipeline.runWindowed(spark, srcDir, sink, tmp("win_ck"))
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val streamed = spark.read.parquet(sink)
    val batch = EventStreamPipeline.windowedCounts(
      Tables(spark, "/root/testdata/sf0.001").events)

    // append mode only emits windows the watermark has closed; every
    // emitted window must match batch exactly, and most windows close
    // (only the trailing watermark horizon stays open).
    val joined = streamed.join(batch.withColumnRenamed("n", "b_n").withColumnRenamed("avg_value", "b_avg"),
      Seq("win_start", "event_type"), "left")
    assert(joined.filter(col("b_n").isNull).count() == 0) // nothing fabricated
    assert(joined.filter(col("n") =!= col("b_n") || col("avg_value") =!= col("b_avg")).count() == 0)
    // No finalized-fraction threshold (same rationale as the hopping
    // test, ADVICE r8): how many windows the watermark closes depends
    // on micro-batch file grouping and the fixture's time span.
    // Emission correctness is pinned by count > 0 + the exact-match join.
    assert(streamed.count() > 0)
  }
}
