package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal decode/feature-extract plumbing (⊕ north-star surface).
  *
  * The real codecs (image/audio libs) are not in this container, so the
  * KERNEL is a deterministic fake — but everything Spark-side is real:
  * the binary column handling, the output schema contract, the
  * per-partition batch iteration (the Scala analogue of `mapInPandas`
  * batch processing), and the partition-count preservation that a
  * 1000-executor decode pass relies on.
  *
  * Reference boundary: the reference ships rasters as base64 bytes
  * (/root/reference/containers/landfire/landfire_container.py:308-320)
  * and decodes with rasterio; at 100 TB the decode runs where the data
  * is — this operator is that shape.
  */
object MultimodalStub {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feat_mean", DoubleType),
    StructField("feat_dim", IntegerType)
  ))

  /** Stub codec kernel: a real implementation would decode the blob
    * (PNG/WAV/frame-sample) and emit features; this derives a
    * deterministic pseudo-feature from the bytes so the pipeline is
    * testable end-to-end without codec libraries. */
  private def fakeDecode(blob: Array[Byte]): (Double, Int) = {
    var acc = 0L
    var i = 0
    while (i < blob.length) { acc = (acc * 31 + (blob(i) & 0xff)) & 0xffffffL; i += 1 }
    (acc.toDouble / 0xffffffL.toDouble, 64)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_feat", DoubleType)
  ))

  /** Frame sampling over video-like blobs: every `stride`-th chunk of the
    * payload becomes one "frame" row with a stub feature — the row
    * multiplication + schema shape of video frame extraction, with the
    * real codec swapped for a deterministic kernel. Output cardinality
    * is bounded by `maxFrames` per blob (a runaway 10-hour video must
    * not explode one task). */
  def sampleFrames(media: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0 && maxFrames > 0, s"stride/maxFrames must be positive")
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("blob")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]]("blob")
          val n = math.min(maxFrames, math.max(1, blob.length / stride))
          (0 until n).iterator.map { f =>
            val off = f * stride
            val end = math.min(blob.length, off + stride)
            var acc = 0L
            var i = off
            while (i < end) { acc = (acc * 31 + (blob(i) & 0xff)) & 0xffffffL; i += 1 }
            Row(id, f, acc.toDouble / 0xffffffL.toDouble)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Partition-wise feature extraction over a DataFrame with
    * (doc_id long, media_type string, blob binary). Batch shape: one
    * iterator pass per partition, constant memory, no driver collect. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media_type"), col("blob")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val (mean, dim) = fakeDecode(blob)
          Row(r.getLong(0), r.getString(1), blob.length, mean, dim)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
