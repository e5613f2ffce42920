package graft

import graft.ops.MultimodalStub
import org.apache.spark.sql.functions._

/** The multimodal decode stub: kernel is fake, plumbing is real —
  * schema contract, determinism, partition-wise execution. */
class MultimodalStubSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDf = Seq(
    (1L, "image/png", "aaaa"), (2L, "audio/wav", "bbbbbb"), (3L, "video/mp4", "cc")
  ).toDF("doc_id", "media_type", "txt")
    .withColumn("blob", encode(col("txt"), "UTF-8"))
    .drop("txt")

  test("feature extraction preserves rows, emits the declared schema, and is deterministic") {
    val f1 = MultimodalStub.extractFeatures(mediaDf.repartition(3))
    assert(f1.schema == MultimodalStub.featureSchema)
    assert(f1.count() == 3)
    val a = f1.orderBy("doc_id").collect().toSeq
    val b = MultimodalStub.extractFeatures(mediaDf.repartition(2)).orderBy("doc_id").collect().toSeq
    assert(a == b) // partitioning must not change results
    // n_bytes reflects the actual blob size
    assert(f1.filter(col("doc_id") === 2).select("n_bytes").as[Int].head() == 6)
  }

  test("frame sampling multiplies rows deterministically and caps at maxFrames") {
    val frames = MultimodalStub.sampleFrames(mediaDf, stride = 2, maxFrames = 10)
    assert(frames.schema == MultimodalStub.frameSchema)
    // doc 1: 4 bytes / stride 2 = 2 frames; doc 2: 3; doc 3: 1
    val byDoc = frames.groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
    // cap: stride 1 with maxFrames 2 → 2 frames per doc regardless of size
    val capped = MultimodalStub.sampleFrames(mediaDf, stride = 1, maxFrames = 2)
    assert(capped.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    // deterministic across partitionings
    val a = frames.orderBy("doc_id", "frame_idx").collect().toSeq
    val b = MultimodalStub.sampleFrames(mediaDf.repartition(3), 2, 10)
      .orderBy("doc_id", "frame_idx").collect().toSeq
    assert(a == b)
  }

  test("features are in [0,1] and dimension metadata is constant") {
    val f = MultimodalStub.extractFeatures(mediaDf)
    assert(f.filter(col("feat_mean") < 0 || col("feat_mean") > 1).count() == 0)
    assert(f.select("feat_dim").distinct().as[Int].collect().toSeq == Seq(64))
  }
}
