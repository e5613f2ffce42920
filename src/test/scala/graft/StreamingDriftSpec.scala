package graft

import java.nio.file.Files
import graft.streaming.StreamingDrift
import graft.queries.QueryRegistry
import org.apache.spark.sql.functions._

/** Streamed drift census vs the a13_drift_tvd batch query: replay the
  * documents fixture as three micro-batches in an ADVERSARIAL order
  * (shuffled by md5, not time — the operator documents order
  * independence, so the spec exercises it) and require the final per-bin
  * (ref, cur) counts to reproduce the batch query's drift rows exactly —
  * ppm masses, TVD, and chi-square surrogate, all integer math, no
  * tolerance. */
class StreamingDriftSpec extends SparkSpecBase {

  test("streamed per-bin census reproduces the batch drift rows exactly") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .sortBy(r => org.apache.spark.unsafe.types.UTF8String
        .fromString(s"shuffle:${r.getLong(0)}").hashCode())

    val flat = Files.createTempDirectory("drift_src").toString
    val slices = docs.grouped(math.ceil(docs.length / 3.0).toInt).toSeq
    for ((slice, i) <- slices.zipWithIndex) {
      val staged = Files.createTempDirectory(s"drift_part$i").toString
      slice.map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val f = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(flat, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + i * 60000L)
    }

    val sink = Files.createTempDirectory("drift_sink").toString
    val q = StreamingDrift.run(spark, flat, sink,
      Files.createTempDirectory("drift_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    // counts are monotone per bin — the final census row per bin is the
    // one with the largest (c_ref + c_cur)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin"))
      .orderBy((col("c_ref") + col("c_cur")).desc)
    val streamedCensus = spark.read.parquet(sink)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bin"), col("c_ref"), col("c_cur"))

    // recompute the batch query's drift rows from the streamed census
    // with the IDENTICAL integer arithmetic
    val totals = streamedCensus.agg(
      sum(col("c_ref")).as("t_ref"), sum(col("c_cur")).as("t_cur"))
    val streamedDrift = streamedCensus.crossJoin(broadcast(totals))
      .select(col("bin"),
        expr("(c_ref * 1000000L) div t_ref").as("ref_ppm"),
        expr("(c_cur * 1000000L) div t_cur").as("cur_ppm"))
      .withColumn("diff_ppm", abs(col("ref_ppm") - col("cur_ppm")))
      .withColumn("drift_score",
        expr("((ref_ppm - cur_ppm) * (ref_ppm - cur_ppm)) div (cur_ppm + 1L)"))

    val batch = QueryRegistry.queries("a13_drift_tvd")(spark, dir)
    assert(streamedDrift.count() == batch.count(),
      "streamed census covers a different bin set than the batch query")
    val mism = streamedDrift.alias("s")
      .join(batch.alias("b"), col("s.bin") === col("b.bin"))
      .filter(col("s.ref_ppm") =!= col("b.ref_ppm") ||
        col("s.cur_ppm") =!= col("b.cur_ppm") ||
        col("s.diff_ppm") =!= col("b.diff_ppm") ||
        col("s.drift_score") =!= col("b.drift_score"))
    assert(mism.count() == 0,
      s"streamed drift diverged from batch: ${mism.collect().take(3).mkString(", ")}")
  }
}
