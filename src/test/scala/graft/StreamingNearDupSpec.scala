package graft

import java.nio.file.Files
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._

/** Streaming LSH dedup: the incremental per-bucket pairing must produce
  * exactly the batch pipeline's candidate set once the stream drains —
  * prefix-incremental LSH loses nothing vs the full-corpus join. */
class StreamingNearDupSpec extends SparkSpecBase {

  test("streamed candidate pairs equal the batch banded-join candidate set") {
    val src = Files.createTempDirectory("snd_src").toString
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    docs.repartition(5).write.mode("overwrite").parquet(src)

    val sink = Files.createTempDirectory("snd_sink").toString
    val q = StreamingNearDup.run(spark, src, sink,
      Files.createTempDirectory("snd_ck").toString)
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val streamed = spark.read.parquet(sink).select("i", "j").distinct()

    // batch reference: same banding, bucket filter [2, MaxBucket], self-join.
    // Precondition for exact equivalence: no bucket over the cap (the batch
    // guard drops oversized buckets wholesale, the stream stops pairing at
    // the cap — different tails). The 3-gram basis keeps buckets tiny.
    val bands = StreamingNearDup.bandRows(docs)
    val oversized = bands.groupBy("b", "band_key").count()
      .filter(col("count") > StreamingNearDup.MaxBucket).count()
    assert(oversized == 0, "fixture grew an oversized bucket; equivalence precondition broken")
    val keep = bands.groupBy("b", "band_key").count()
      .filter(col("count").between(2, StreamingNearDup.MaxBucket))
      .select("b", "band_key")
    val kept = bands.join(keep, Seq("b", "band_key"))
    val batch = kept.select(col("b"), col("band_key"), col("doc_id").as("i"))
      .join(kept.select(col("b"), col("band_key"), col("doc_id").as("j")), Seq("b", "band_key"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()

    val nStreamed = streamed.count()
    val nBatch = batch.count()
    val missing = batch.join(streamed, Seq("i", "j"), "left_anti").count()
    val extra = streamed.join(batch, Seq("i", "j"), "left_anti").count()
    assert(missing == 0 && extra == 0,
      s"candidate sets diverge: batch=$nBatch streamed=$nStreamed missing=$missing extra=$extra")
  }
}
