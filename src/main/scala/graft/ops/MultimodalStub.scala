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
