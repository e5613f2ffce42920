package graft

import java.nio.file.Files
import graft.ops.ResultCache
import graft.streaming.StreamingResultCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streamed result cache vs the batch ResultCache fold: replay the
  * fixture's request log (events keyed by user) as three day-window
  * micro-batches through BOTH paths with the same pure
  * compute(key, probe-µs) stamp, and require equal per-batch
  * (outcome, n, Σv) censuses and an identical drained cache table.
  * The TTL straddles the windows (48 h over daily batches), so hit,
  * cold and expired all fire across the replay. */
class StreamingResultCacheSpec extends SparkSpecBase {

  private val Ttl = 172800L // 48 h, same shape as e2e_result_cache
  private val computeFn: (Long, Long) => Long =
    (key, rtsUs) => key * 100000L + rtsUs / 86400000000L // key + epoch-day stamp

  private def dayWindows(reqs: DataFrame): Seq[DataFrame] =
    Seq("2024-01-01" -> "2024-01-02", "2024-01-02" -> "2024-01-03",
      "2024-01-03" -> "2024-01-04").map { case (lo, hi) =>
      reqs.filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
    }

  test("day-window streamed cache equals the batch serve fold: censuses " +
    "and drained cache identical") {
    val dir = "/root/testdata/sf0.001"
    val reqs = Tables(spark, dir).events
      .select(col("user_id").cast("long").as("key"), col("ts"))
    val windows = dayWindows(reqs)

    // batch side: fold ResultCache.serve over the three windows
    var cache = reqs.filter(lit(false))
      .select(col("key"), (col("key") * 0).as("v"), col("ts").as("cached_at"))
    val batchCensus = windows.zipWithIndex.map { case (w, i) =>
      val step = ResultCache.serve(cache, w, Ttl, misses =>
        misses.withColumn("v", expr(s"key * 100000 + unix_micros(rts) div 86400000000")))
      cache = step.cache
      i.toLong -> step.served.groupBy(col("outcome"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }.toMap
    val batchCache = cache.select("key", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // streaming side: land one file per day window, drain AvailableNow
    val flat = Files.createTempDirectory("rc_src").toString
    for ((w, i) <- windows.zipWithIndex) {
      val staged = Files.createTempDirectory(s"rc_part$i").toString
      w.coalesce(1).write.mode("overwrite").parquet(staged)
      val f = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(flat, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }
    val sink = Files.createTempDirectory("rc_sink").toString
    val q = StreamingResultCache.run(spark, flat, sink,
      Files.createTempDirectory("rc_ck").toString, Ttl, computeFn)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val served = spark.read.parquet(sink)
    // per-batch censuses match the batch fold exactly
    for ((bid, expected) <- batchCensus) {
      val got = served.filter(col("batch_id") === bid).groupBy(col("outcome"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"batch $bid census diverged: $got vs $expected")
    }
    // drained cache state: per key, the LAST non-hit row is the live
    // entry; it must equal the batch fold's final cache table
    val streamCache = served.filter(col("outcome") =!= "hit")
      .groupBy(col("key"))
      .agg(max(struct(col("batch_id"), col("v"))).as("m"))
      .select(col("key"), col("m.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(streamCache.sameElements(batchCache),
      s"drained cache diverged (first 3): ${streamCache.take(3).mkString(",")} vs ${batchCache.take(3).mkString(",")}")
  }
}
