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

  test("features are in [0,1] and dimension metadata is constant") {
    val f = MultimodalStub.extractFeatures(mediaDf)
    assert(f.filter(col("feat_mean") < 0 || col("feat_mean") > 1).count() == 0)
    assert(f.select("feat_dim").distinct().as[Int].collect().toSeq == Seq(64))
  }
}
