package graft

import graft.ops.{MultimodalStub, PngCodec, WavCodec}
import org.apache.spark.sql.functions._

/** The multimodal feature pass: REAL PNG/WAV kernels (round 12), fake
  * kernel for video only, quarantine rows for undecodable payloads —
  * plus the plumbing guarantees (schema contract, determinism,
  * partition-wise execution) that were always real. */
class MultimodalStubSpec extends SparkSpecBase {
  import spark.implicits._

  // 4x2 grey PNG with known pixels: mean = (0+..+7)*30/8 = 105 -> /255
  private val pngPx = Array.tabulate(8)(_ * 30)
  private val pngBytes = PngCodec.encode(4, 2, 1, pngPx, r => r % 5)
  // 6 mono samples with known |mean| = 1200/6 = 200 -> /32768
  private val wavSamples = Array(100, -200, 300, -150, 250, 200)
  private val wavBytes = WavCodec.encode(wavSamples, 8000, 1)

  private def mediaDf = Seq(
    (1L, "image/png", pngBytes),
    (2L, "audio/wav", wavBytes),
    (3L, "video/mp4", "cc".getBytes("UTF-8")),
    (4L, "image/png", "<html>upstream error</html>".getBytes("UTF-8"))
  ).toDF("doc_id", "media_type", "blob")

  test("feature extraction preserves rows, emits the declared schema, and is deterministic") {
    val f1 = MultimodalStub.extractFeatures(mediaDf.repartition(3))
    assert(f1.schema == MultimodalStub.featureSchema)
    assert(f1.count() == 4)
    val a = f1.orderBy("doc_id").collect().toSeq
    val b = MultimodalStub.extractFeatures(mediaDf.repartition(2)).orderBy("doc_id").collect().toSeq
    assert(a == b) // partitioning must not change results
    // n_bytes reflects the actual blob size
    assert(f1.filter(col("doc_id") === 3).select("n_bytes").as[Int].head() == 2)
  }

  test("PNG and WAV features come from the real decoders") {
    val f = MultimodalStub.extractFeatures(mediaDf).orderBy("doc_id").collect()
    val png = f(0)
    assert(png.getAs[Boolean]("real_decode"))
    assert(math.abs(png.getAs[Double]("feat_mean") - 105.0 / 255.0) < 1e-12)
    assert(png.getAs[Int]("feat_dim") == 8)
    val wav = f(1)
    assert(wav.getAs[Boolean]("real_decode"))
    assert(math.abs(wav.getAs[Double]("feat_mean") - 200.0 / 32768.0) < 1e-12)
    assert(wav.getAs[Int]("feat_dim") == 6)
  }

  test("video runs the documented fake kernel; undecodable payloads quarantine as null") {
    val f = MultimodalStub.extractFeatures(mediaDf).orderBy("doc_id").collect()
    val video = f(2)
    assert(!video.getAs[Boolean]("real_decode"))
    val vm = video.getAs[Double]("feat_mean")
    assert(vm >= 0 && vm <= 1 && video.getAs[Int]("feat_dim") == 64)
    val bad = f(3) // claims image/png, is an HTML error page
    assert(!bad.getAs[Boolean]("real_decode"))
    assert(bad.isNullAt(bad.fieldIndex("feat_mean")))
    assert(bad.isNullAt(bad.fieldIndex("feat_dim")))
  }

  test("frame sampling multiplies rows deterministically and caps at maxFrames") {
    val vid = Seq((1L, "aaaa"), (2L, "bbbbbb"), (3L, "cc"))
      .toDF("doc_id", "txt")
      .withColumn("blob", encode(col("txt"), "UTF-8")).drop("txt")
    val frames = MultimodalStub.sampleFrames(vid, stride = 2, maxFrames = 10)
    assert(frames.schema == MultimodalStub.frameSchema)
    // doc 1: 4 bytes / stride 2 = 2 frames; doc 2: 3; doc 3: 1
    val byDoc = frames.groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
    // cap: stride 1 with maxFrames 2 → 2 frames per doc regardless of size
    val capped = MultimodalStub.sampleFrames(vid, stride = 1, maxFrames = 2)
    assert(capped.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    // deterministic across partitionings
    val a = frames.orderBy("doc_id", "frame_idx").collect().toSeq
    val b = MultimodalStub.sampleFrames(vid.repartition(3), 2, 10)
      .orderBy("doc_id", "frame_idx").collect().toSeq
    assert(a == b)
  }
}
