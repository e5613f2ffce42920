package graft

import graft.ops.ResultCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The half of the result-cache contract the DuckDB oracle can't see:
  * `compute` (the expensive enrichment) must receive ONLY miss keys —
  * a repeat request inside the TTL is served from the cache table
  * without re-running enrichment, and an expired entry is recomputed
  * and refreshed. */
class ResultCacheSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def reqs(at: String, keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.map(k => (k, ts(at))).toDF("key", "ts")
  }

  test("within-TTL replay serves from cache: compute sees zero rows and " +
    "served values are the cached ones") {
    import spark.implicits._
    var computeInputs = scala.collection.mutable.ArrayBuffer[Long]()
    def compute(stamp: Long)(df: DataFrame): DataFrame = {
      computeInputs ++= df.select("key").as[Long].collect()
      df.withColumn("v", col("key") * 100 + stamp)
    }
    val empty = reqs("2024-06-01 00:00:00", Nil)
      .select(col("key"), (col("key") * 0).as("v"), col("ts").as("cached_at"))

    // batch 1: cold start — every key computed, stamped 1
    val s1 = ResultCache.serve(empty, reqs("2024-06-01 00:00:00", Seq(1, 2, 3)),
      ttlSeconds = 3600, compute(1))
    assert(computeInputs.sorted == Seq(1L, 2L, 3L))

    // batch 2: same keys 30 min later — all hits, compute NOT re-run,
    // served values still carry batch-1 stamps
    computeInputs.clear()
    val s2 = ResultCache.serve(s1.cache, reqs("2024-06-01 00:30:00", Seq(1, 2, 3)),
      ttlSeconds = 3600, compute(2))
    val served2 = s2.served.select("key", "outcome", "v").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(computeInputs.isEmpty, s"compute ran on a full-hit batch: $computeInputs")
    assert(served2.map(_._2).forall(_ == "hit"))
    assert(served2.map(_._3).toSeq == Seq(101L, 201L, 301L))

    // batch 3: past the TTL — expired, recomputed with the new stamp,
    // plus one cold newcomer; compute sees exactly the four misses
    computeInputs.clear()
    val s3 = ResultCache.serve(s2.cache, reqs("2024-06-01 02:00:00", Seq(1, 2, 3, 9)),
      ttlSeconds = 3600, compute(3))
    val served3 = s3.served.select("key", "outcome", "v").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(computeInputs.sorted == Seq(1L, 2L, 3L, 9L))
    assert(served3.map(_._2).toSeq == Seq("expired", "expired", "expired", "cold"))
    assert(served3.map(_._3).toSeq == Seq(103L, 203L, 303L, 903L))

    // the refreshed snapshot carries the new stamps and timestamps
    val cache3 = s3.cache.select("key", "v").as[(Long, Long)].collect().sortBy(_._1)
    assert(cache3.toSeq == Seq((1L, 103L), (2L, 203L), (3L, 303L), (9L, 903L)))
  }

  test("a hit never extends the TTL: entry age is measured from compute " +
    "time, not last access") {
    import spark.implicits._
    val empty = reqs("2024-06-01 00:00:00", Nil)
      .select(col("key"), (col("key") * 0).as("v"), col("ts").as("cached_at"))
    def compute(stamp: Long)(df: DataFrame): DataFrame =
      df.withColumn("v", col("key") * 100 + stamp)
    val s1 = ResultCache.serve(empty, reqs("2024-06-01 00:00:00", Seq(7)), 3600, compute(1))
    // accessed at :50 (hit) — but cached_at stays :00 …
    val s2 = ResultCache.serve(s1.cache, reqs("2024-06-01 00:50:00", Seq(7)), 3600, compute(2))
    assert(s2.served.select("outcome").as[String].collect().toSeq == Seq("hit"))
    // … so at 1:10 the entry is 70 min old and must expire, even though
    // the last ACCESS was only 20 min ago
    val s3 = ResultCache.serve(s2.cache, reqs("2024-06-01 01:10:00", Seq(7)), 3600, compute(3))
    assert(s3.served.select("outcome").as[String].collect().toSeq == Seq("expired"))
    assert(s3.served.select("v").as[Long].collect().toSeq == Seq(703L))
  }

  test("duplicate keys in one batch coalesce to a single probe at the " +
    "earliest request time") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("key", "ts")
      .select(col("key"), (col("key") * 0).as("v"), col("ts").as("cached_at"))
    var n = 0L
    val batch = Seq((5L, ts("2024-06-01 00:20:00")), (5L, ts("2024-06-01 00:05:00")),
      (5L, ts("2024-06-01 00:40:00"))).toDF("key", "ts")
    val s1 = ResultCache.serve(empty, batch, 3600,
      df => { n = df.count(); df.withColumn("v", col("key")) })
    assert(n == 1, "duplicate in-flight requests must coalesce")
    assert(s1.cache.select("cached_at").as[java.sql.Timestamp].collect().toSeq ==
      Seq(ts("2024-06-01 00:05:00")))
  }
}
