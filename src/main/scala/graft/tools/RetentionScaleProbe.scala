package graft.tools

import graft.GraftSession
import graft.streaming.StreamingRetention
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Estate-scale RocksDB leg for a ValueState-family operator (VERDICT
  * r11 next #5): runs the transformWithState retention triangle
  * (16-byte ValueState per user: cohort day + 64-bit age bitmask) over
  * the sf1 events estate, CRASHES the stream with an injected
  * post-write failure — the batch's sink output lands but its offset
  * never commits, so the restart replays a genuinely uncommitted batch
  * against version-restored RocksDB state — then drains and proves the
  * reconstructed cohort×age triangle equals the batch computation
  * EXACTLY. Prints ONE JSON line (the committed artifact) and exits
  * nonzero on any divergence.
  *
  * The operator's documented in-order-across-batches precondition is
  * satisfied by re-staging the estate as one file per day, fed to the
  * stream in day order (maxFilesPerTrigger=1) — the shape a real ingest
  * gives this operator (daily arrival), not a probe concession.
  *
  * Usage: spark-submit --class graft.tools.RetentionScaleProbe <jar>
  *        [eventsDir] [outJson]
  */
object RetentionScaleProbe {

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

  /** Stage the estate as one single-file parquet per activity day, file
    * names and mtimes ascending in day order so the file stream source
    * delivers days in order. */
  private def stageByDay(spark: SparkSession, eventsDir: String, stageDir: String): Int = {
    // same ts normalization as Tables.events (driver fixtures store
    // nanos-as-long under the session's legacy flag; estates store µs)
    val raw = spark.read.parquet(eventsDir)
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    val ev = normalized.withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val days = ev.select(col("day")).distinct().orderBy(col("day"))
      .collect().map(_.getLong(0)) // bounded: the fixture horizon is <= 64 days
    val base = java.nio.file.Paths.get(stageDir)
    java.nio.file.Files.createDirectories(base)
    val t0 = System.currentTimeMillis() - days.length * 2000L
    days.zipWithIndex.foreach { case (d, i) =>
      val tmp = s"$stageDir/_tmp_day"
      ev.filter(col("day") === d).drop("day")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = base.resolve(f"day$i%03d.parquet")
      java.nio.file.Files.move(part, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(t0 + i * 1000L) // mtime ascending with day
      // drop the _tmp_day job dir (metadata + crc files)
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    days.length
  }

  /** The cohort×age triangle from (user, cohort_day, mask) snapshots:
    * masks are monotone per user, so max(mask) absorbs replays. */
  private def triangleFromSnapshots(snaps: DataFrame): DataFrame =
    snaps.groupBy(col("user_id"))
      .agg(min(col("cohort_day")).as("cohort_day"), max(col("mask")).as("mask"))
      .select(col("user_id"), col("cohort_day"),
        explode(expr(
          "filter(transform(sequence(0, 63), b -> IF((shiftright(mask, b) & 1) = 1, b, -1)), x -> x >= 0)"
        )).as("age_days"))
      .groupBy(col("cohort_day"), col("age_days"))
      .agg(count(lit(1)).as("n_active"))

  /** The batch triangle straight from the staged events — the
    * w7_retention_cohorts math on epoch days. */
  private def triangleFromBatch(spark: SparkSession, stageDir: String): DataFrame = {
    val ev = spark.read.parquet(stageDir)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val fs = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.select(col("user_id"), col("day")).distinct()
      .join(fs, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .groupBy(col("cohort_day"), col("age_days"))
      .agg(count(lit(1)).as("n_active"))
  }

  def main(args: Array[String]): Unit = {
    val eventsDir = if (args.length > 0) args(0)
      else "/root/repo/target/scale/sf1/events.parquet"
    val outJson = if (args.length > 1) args(1)
      else "/root/repo/scale/stream_retention_sf1_r12.json"
    val spark = GraftSession.local("graft-retention-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("retention_probe").toString
    val stage = s"$work/staged"; val sink = s"$work/snaps"; val ck = s"$work/ck"
    val nDays = stageByDay(spark, eventsDir, stage)

    // ---- phase 1: crash with an uncommitted batch ----------------------
    val crashedAt = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q1 = StreamingRetention.runWithSink(spark, stage, ck, (batch, id) => {
      batch.write.mode("append").parquet(sink)
      if (id >= 5 && crashedAt.compareAndSet(-1L, id))
        throw new RuntimeException(
          s"graft injected post-write crash at batch $id (sink written, offset uncommitted)")
    })
    val crashSurfaced =
      try { q1.awaitTermination(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    val p1 = progressRows(q1)

    // ---- phase 2: restart from the checkpoint and drain -----------------
    val q2 = StreamingRetention.run(spark, stage, sink, ck)
    q2.awaitTermination()
    val p2 = progressRows(q2)

    // ---- correctness: streamed triangle == batch triangle ---------------
    val streamed = triangleFromSnapshots(spark.read.parquet(sink)).cache()
    val expected = triangleFromBatch(spark, stage).cache()
    val missing = expected.exceptAll(streamed).count()
    val extra = streamed.exceptAll(expected).count()
    val nUsers = spark.read.parquet(sink).select(col("user_id")).distinct().count()
    val nEvents = spark.read.parquet(stage).count()
    val ok = crashSurfaced && missing == 0 && extra == 0

    val ckBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(ck))
      .filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()

    val line = s"""{"probe":"stream_retention","events_dir":"$eventsDir",""" +
      s""""n_events":$nEvents,"n_users":$nUsers,"n_day_files":$nDays,""" +
      s""""crashed_at_batch":${crashedAt.get()},"crash_surfaced":$crashSurfaced,""" +
      s""""triangle_rows":${expected.count()},"missing":$missing,"extra":$extra,""" +
      s""""match":$ok,"checkpoint_bytes":$ckBytes,""" +
      s""""progress_phase1":[${p1.mkString(",")}],""" +
      s""""progress_phase2":[${p2.mkString(",")}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line + "\n")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
