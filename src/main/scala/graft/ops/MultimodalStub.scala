package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal decode/feature-extract plumbing (⊕ north-star surface).
  *
  * As of round 12 the image and audio kernels are REAL decoders —
  * [[PngCodec]] (zlib IDAT + all five scanline filters) and [[WavCodec]]
  * (RIFF/PCM) — implemented JDK-only, like [[TiffCodec]] before them.
  * Only the VIDEO kernel remains a documented deterministic fake (no
  * video codec is expressible JDK-only); the Spark side — binary column
  * handling, output schema contract, per-partition batch iteration (the
  * Scala analogue of `mapInPandas`), partition-count preservation — was
  * always real and is unchanged.
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
    // true = a real codec produced the features; false = the documented
    // fake kernel (video) or a failed decode (feat_* null — the
    // quarantine path)
    StructField("real_decode", BooleanType),
    StructField("feat_mean", DoubleType),
    StructField("feat_dim", IntegerType)
  ))

  /** Stub codec kernel — VIDEO ONLY as of round 12: a deterministic
    * pseudo-feature from the bytes so the frame pipeline is testable
    * end-to-end without a video codec (not expressible JDK-only; PNG and
    * WAV no longer come through here). */
  private[ops] def fakeDecode(blob: Array[Byte]): (Double, Int) = {
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
    * iterator pass per partition, constant memory, no driver collect.
    * Kernel dispatch by media type: image/png and audio/wav run the
    * REAL decoders (mean normalized sample + true dimensionality);
    * undecodable payloads yield null features with real_decode=false
    * (the quarantine row, counted not thrown — the d1_tiff_decode
    * contract); everything else (video) runs the documented fake. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media_type"), col("blob")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val mt = r.getString(1)
          val (real, mean, dim) = mt match {
            case "image/png" =>
              PngCodec.decode(blob) match {
                case Some(img) =>
                  val s = img.pixels.foldLeft(0L)(_ + _)
                  (true, s.toDouble / img.pixels.length / 255.0, img.pixels.length)
                case None => (false, null, null)
              }
            case "audio/wav" =>
              WavCodec.decode(blob) match {
                case Some(wav) =>
                  val full = if (wav.bitsPerSample == 16) 32768.0 else 128.0
                  val s = wav.samples.foldLeft(0L)((a, x) => a + math.abs(x))
                  (true, s.toDouble / wav.samples.length / full, wav.samples.length)
                case None => (false, null, null)
              }
            case _ =>
              val (m, d) = fakeDecode(blob)
              (false, m, d)
          }
          Row(r.getLong(0), mt, blob.length, real,
            mean.asInstanceOf[Any], dim.asInstanceOf[Any])
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
