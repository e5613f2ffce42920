package graft.tools

import graft.GraftSession
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-state-at-scale probe (VERDICT r10 next #7, crash-realism
  * hardened per r11 ADVICE): runs the transformWithState near-dup
  * detector over a REAL estate (sf1: 500 k documents) on the RocksDB
  * state store, CRASHES the query with an injected post-write failure —
  * the batch's parquet output lands but its offset commit never does,
  * so the restart replays a genuinely uncommitted batch against
  * version-restored RocksDB state (not the planned restart a graceful
  * stop() exercises) — and then proves the drained candidate set still
  * equals the batch LSH candidate set — while
  * recording per-batch latency and RocksDB state-store size from the
  * engine's own StreamingQueryProgress. Prints ONE JSON line (the
  * committed artifact) and exits nonzero on any divergence.
  *
  * Usage: spark-submit --class graft.tools.StreamScaleProbe <jar>
  *        [docsDir] [outJson]
  */
object StreamScaleProbe {

  private def progressRows(q: StreamingQuery): Seq[String] =
    q.recentProgress.toSeq.filter(_.numInputRows > 0).map { p =>
      val so = p.stateOperators.headOption
      val rocksBytes = so.map(_.customMetrics.getOrDefault("rocksdbSstFileSize", -1L))
        .getOrElse(-1L)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""trigger_ms":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
        s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""rocksdb_sst_bytes":$rocksBytes}"""
    }

  def main(args: Array[String]): Unit = {
    val docsDir = if (args.length > 0) args(0)
      else "/root/repo/target/scale/sf1/documents.parquet"
    val outJson = if (args.length > 1) args(1)
      else "/root/repo/scale/stream_state_sf1_r12.json"
    val spark = GraftSession.local("graft-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("stream_probe").toString
    val sink = s"$work/pairs"; val ck = s"$work/ck"

    // ---- phase 1: CRASH the stream with an uncommitted batch -----------
    // The sink writes its parquet output and then throws on the first
    // batch with id >= 3 — the batch's side effects land but its offset
    // commit never happens, so the query dies with a genuinely
    // UNCOMMITTED batch (not a graceful stop()'s clean commit) and the
    // restart must replay it. foreachBatch is at-least-once by contract:
    // the replay double-appends that batch's pairs, which the
    // distinct-on-read below absorbs — and the raw-vs-distinct sink row
    // counts recorded in the artifact are the visible proof the replay
    // actually happened.
    val crashedAt = new java.util.concurrent.atomic.AtomicLong(-1L) // set on the stream thread, read on main
    val q1 = StreamingNearDup.runWithSink(spark, docsDir, ck, (batch, id) => {
      batch.write.mode("append").parquet(sink)
      if (id >= 3 && crashedAt.compareAndSet(-1L, id))
        throw new RuntimeException(
          s"graft injected post-write crash at batch $id (sink written, offset uncommitted)")
    })
    val crashSurfaced =
      try { q1.awaitTermination(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    val p1 = progressRows(q1)
    val killedAfter = p1.size

    // ---- phase 2: restart from the checkpoint and drain ----------------
    // the replayed batch re-runs through transformWithState against the
    // RocksDB state RESTORED to the pre-crash-batch version
    val q2 = StreamingNearDup.run(spark, docsDir, sink, ck)
    q2.awaitTermination() // AvailableNow: terminates when caught up
    val p2 = progressRows(q2)

    // ---- correctness: drained pairs == batch LSH candidate set ---------
    val docs = spark.read.parquet(docsDir)
    val bands = StreamingNearDup.bandRows(docs).cache()
    val maxBucket = bands.groupBy(col("b"), col("band_key"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    // the stream==batch equivalence precondition (see StreamingNearDup)
    val capOk = maxBucket <= StreamingNearDup.MaxBucket
    val l = bands.select(col("b"), col("band_key"), col("doc_id").as("i"))
    val r = bands.select(col("b"), col("band_key"), col("doc_id").as("j"))
    val expected = l.join(r, Seq("b", "band_key"))
      .filter(col("i") < col("j")).select(col("i"), col("j")).distinct().cache()
    val rawSink = spark.read.parquet(sink).select(col("i"), col("j"))
    val nRaw = rawSink.count()
    val streamed = rawSink.distinct().cache()
    val nExpected = expected.count(); val nStreamed = streamed.count()
    val missing = expected.exceptAll(streamed).count()
    val extra = streamed.exceptAll(expected).count()
    // the crash must have surfaced as a failed query AND the replayed
    // batch must be visible as duplicate raw sink rows (nRaw > distinct)
    // unless the replayed batch emitted zero pairs
    val ok = capOk && missing == 0 && extra == 0 && crashSurfaced

    val ckBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(ck))
      .filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()

    val line = s"""{"probe":"stream_state","docs_dir":"$docsDir",""" +
      s""""n_docs":${docs.count()},"max_bucket":$maxBucket,"cap_ok":$capOk,""" +
      s""""killed_after_batches":$killedAfter,"crashed_at_batch":${crashedAt.get()},""" +
      s""""crash_surfaced":$crashSurfaced,"raw_sink_rows":$nRaw,""" +
      s""""expected_pairs":$nExpected,"streamed_pairs":$nStreamed,""" +
      s""""missing":$missing,"extra":$extra,"match":$ok,""" +
      s""""checkpoint_bytes":$ckBytes,""" +
      s""""progress_phase1":[${p1.mkString(",")}],""" +
      s""""progress_phase2":[${p2.mkString(",")}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line + "\n")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
