package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Contract test for `Tables.events` timestamp normalization.
  *
  * The driver fixtures have shipped `events.ts` in three different parquet
  * encodings across rounds — INT64 nanos (read as long with the legacy
  * nanosAsLong flag), µs TIMESTAMP_NTZ (no timezone), and µs UTC-adjusted
  * TIMESTAMP — and each re-encoding silently broke every `unix_micros(ts)`
  * call site until the loader caught up (the round-7 regression took out 3
  * queries and 12 tests). This spec writes the SAME logical instants in all
  * three encodings and asserts the loader yields a bit-identical
  * session-TZ `TimestampType` column for each, so a future fixture
  * re-encoding fails HERE, loudly, instead of deep inside query analysis.
  */
class TimestampEncodingSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tsenc_$tag").toString

  // known µs-aligned instants spanning a DST boundary in several zones —
  // if any encoding path applied a local-zone shift, these would diverge
  private val micros = Seq(
    0L,                      // epoch
    1698541200000000L,       // 2023-10-29 01:00:00 UTC (EU DST fall-back)
    1781388000123456L,       // 2026-06-14 with sub-second µs
    -3600000000L)            // pre-epoch

  test("all three fixture encodings normalize to the same TimestampType column") {
    val base = spark.createDataFrame(
        spark.sparkContext.parallelize(micros.zipWithIndex.map { case (us, i) =>
          org.apache.spark.sql.Row(i.toLong, us)
        }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("us",
            org.apache.spark.sql.types.LongType, nullable = false))))

    // encoding 1: µs UTC-adjusted TIMESTAMP (the "plain" branch)
    val dirUtc = tmp("utc")
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dirUtc/events.parquet")

    // encoding 2: µs TIMESTAMP_NTZ (tz: None — the round-7 regression)
    val dirNtz = tmp("ntz")
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")

    // encoding 3: INT64 nanos-as-long (how TIMESTAMP(NANOS) parquet
    // arrives under spark.sql.legacy.parquet.nanosAsLong)
    val dirNanos = tmp("nanos")
    base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dirNanos/events.parquet")

    val decoded = Seq(dirUtc, dirNtz, dirNanos).map { dir =>
      val df = Tables(spark, dir).events
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: loader yielded ${df.schema("ts").dataType}, not TimestampType")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }

    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted
    for ((got, dir) <- decoded.zip(Seq("utc", "ntz", "nanos")))
      assert(got == expected, s"encoding $dir decoded to $got, expected $expected")
  }
}
