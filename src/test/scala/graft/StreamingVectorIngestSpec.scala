package graft

import java.nio.file.Files
import graft.streaming.StreamingVectorIngest
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance vs a batch rebuild: the PQ encode is
  * row-local against a FROZEN codebook, so the incrementally-built
  * index must be bit-identical to a one-shot batch encode no matter how
  * the vector stream is chopped into micro-batches or in what order
  * segments land — the property that lets a 100 TB index grow by
  * appending instead of rebuilding. */
class StreamingVectorIngestSpec extends SparkSpecBase {

  test("drained incremental index equals the batch encode; segments are append-only") {
    val base = Tables(spark, "/root/testdata/sf0.001").embeddings
    val cb = StreamingVectorIngest.trainedCodebook(base).cache()

    // land the corpus as UNORDERED files (repartition scrambles rows),
    // one micro-batch per file
    val src = Files.createTempDirectory("vin_src").toString
    base.repartition(5).write.mode("overwrite").parquet(src)

    val idx = Files.createTempDirectory("vin_idx").toString
    val q = StreamingVectorIngest.run(spark, src, idx,
      Files.createTempDirectory("vin_ck").toString, cb)
    assert(q.awaitTermination(120000), "ingest did not terminate within 120s")

    val inc = StreamingVectorIngest.indexSegments(spark, idx)
      .getOrElse(fail("no index segments written"))
    val batch = StreamingVectorIngest.encodeBatch(base, cb)

    // bit-identical: same (vec_id, m) -> code everywhere, same row count
    assert(inc.count() == batch.count(),
      "incremental index row count diverged from the batch rebuild")
    val mism = inc.join(batch.withColumnRenamed("code", "b_code"), Seq("vec_id", "m"))
      .filter(col("code") =!= col("b_code")).count()
    assert(mism == 0, "incremental codes diverged from the batch rebuild")

    // multiple write-once segments landed (one per micro-batch), and a
    // replayed batch would only touch its own directory
    val segs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("b"))
    assert(segs.length > 1, "expected one segment per micro-batch")

    // the compressed-domain probe over the incremental index equals the
    // probe over the batch index: ADC scoring reads ONLY codes, so
    // identical codes must give identical top-1 per query
    def top1(codes: org.apache.spark.sql.DataFrame) = {
      val lut = graft.ops.PqIndex.subVectors(
          base.filter(col("vec_id").between(450, 452))
            .select(col("vec_id"), graft.ops.PqIndex.quantized.as("qe")))
        .withColumnRenamed("vec_id", "q_id")
        .join(cb, "m")
        .withColumn("d2", graft.ops.PqIndex.subDist2)
        .select(col("q_id"), col("m").as("lm"), col("cw_id"), col("d2"))
      codes.join(lut, col("lm") === col("m") && col("cw_id") === col("code"))
        .filter(col("q_id") =!= col("vec_id"))
        .groupBy(col("q_id"), col("vec_id")).agg(sum(col("d2")).as("adc"))
        .groupBy(col("q_id")).agg(min(struct(col("adc"), col("vec_id"))).as("t"))
        .select(col("q_id"), col("t.vec_id").as("hit"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(top1(inc) == top1(batch),
      "ADC probe over the incremental index diverged from the batch index")
  }

  test("a restarted ingest resumes from the checkpoint: old vectors are not re-encoded") {
    val base = Tables(spark, "/root/testdata/sf0.001").embeddings
    val cb = StreamingVectorIngest.trainedCodebook(base).cache()
    val src = Files.createTempDirectory("vrs_src").toString
    val idx = Files.createTempDirectory("vrs_idx").toString
    val ck = Files.createTempDirectory("vrs_ck").toString

    val trancheA = base.filter(col("vec_id") < 250)
    val trancheB = base.filter(col("vec_id") >= 250)

    trancheA.repartition(2).write.mode("append").parquet(src)
    val q1 = StreamingVectorIngest.run(spark, src, idx, ck, cb)
    assert(q1.awaitTermination(120000), "first ingest did not drain")
    val afterA = StreamingVectorIngest.indexSegments(spark, idx).get.count()
    assert(afterA == trancheA.count() * 8, s"first ingest wrote $afterA code rows")

    // "restart": same checkpoint, new vectors landed in the meantime
    trancheB.repartition(2).write.mode("append").parquet(src)
    val q2 = StreamingVectorIngest.run(spark, src, idx, ck, cb)
    assert(q2.awaitTermination(120000), "restarted ingest did not drain")

    val out = StreamingVectorIngest.indexSegments(spark, idx).get
    assert(out.count() == base.count() * 8,
      s"restart re-encoded or dropped vectors: index=${out.count()} expected=${base.count() * 8}")
    assert(out.select("vec_id", "m").distinct().count() == base.count() * 8,
      "duplicate (vec_id, m) code rows after restart")
  }
}
