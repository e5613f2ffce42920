package graft

import java.nio.file.Files
import graft.streaming.StreamingFunnel
import org.apache.spark.sql.functions._

/** Streaming funnel vs an independent in-memory model: replay the
  * fixture as FOUR time-ordered micro-batches (maxFilesPerTrigger=1 over
  * time-split files, the in-order-delivery precondition the scaladoc
  * states) and require the max stage + exact stage-entry times per user
  * to equal a plain Scala fold over the same events — the same
  * model-check style as AsOfJoinRandomSpec. */
class StreamingFunnelSpec extends SparkSpecBase {

  test("multi-batch streamed funnel equals the in-memory stage machine") {
    val events = Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._2.getTime, e._1))

    // land 4 time-contiguous files so the stream replays in event-time order
    val src = Files.createTempDirectory("fn_src").toString
    val slices = events.grouped(math.ceil(events.length / 4.0).toInt).toSeq
    import spark.implicits._
    for ((slice, i) <- slices.zipWithIndex) {
      slice.toSeq.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(s"$src/part$i")
    }
    // readStream over the parent dir picks the files up in name order
    val flat = Files.createTempDirectory("fn_flat").toString
    for (i <- slices.indices) {
      val f = new java.io.File(s"$src/part$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(flat, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      // FileStreamSource orders by modification time: make the replay
      // order explicit (in-order delivery is the documented precondition)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }

    val sink = Files.createTempDirectory("fn_sink").toString
    // idle horizon wider than the fixture's 30-day span so no
    // incomplete funnel evicts mid-replay (eviction semantics are the
    // component's; equivalence needs the full history retained)
    val q = StreamingFunnel.run(spark, flat, sink,
      Files.createTempDirectory("fn_ck").toString, idleMs = 90L * 24 * 3600 * 1000)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    // independent model: fold each user's time-ordered events
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val model = events.groupBy(_._3).map { case (u, evs) =>
      var tv, tc, tp = 0L
      for ((_, ts, _, typ) <- evs) {
        val t = us(ts)
        typ match {
          case "view" if tv == 0L => tv = t
          case "click" if tv != 0L && tc == 0L && t > tv => tc = t
          case "purchase" if tc != 0L && tp == 0L && t > tc => tp = t
          case _ => ()
        }
      }
      u -> ((if (tp != 0L) 3 else if (tc != 0L) 2 else if (tv != 0L) 1 else 0), tv, tc, tp)
    }

    val snaps = spark.read.parquet(sink)
    assert(snaps.count() > 0)
    // stages only advance: the terminal row per user is the max stage,
    // and its entry times must match the model exactly
    val finals = snaps
      .groupBy("user_id")
      .agg(max(struct(col("stage"), col("tv_us"), col("tc_us"), col("tp_us"))).as("m"))
      .select(col("user_id"), col("m.stage"), col("m.tv_us"), col("m.tc_us"), col("m.tp_us"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    val expected = model.filter(_._2._1 > 0)
    assert(finals.keySet == expected.keySet,
      s"user sets differ: stream=${finals.keySet} model=${expected.keySet}")
    for ((u, (stage, tv, tc, tp)) <- expected) {
      assert(finals(u) == ((stage, tv, tc, tp)),
        s"user $u: stream=${finals(u)} model=${(stage, tv, tc, tp)}")
    }
    // multi-batch actually happened (not one trivial batch)
    assert(slices.length >= 3)
  }
}
