package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization index construction (Jégou et al. 2011), shared
  * by the batch queries (`j5_pq_adc` / `j5_pq_refine`) and the streaming
  * index-maintenance path ([[graft.streaming.StreamingVectorIngest]]).
  *
  * Layout: 64 dims × fixed-point micro-units, split into M=8 sub-spaces
  * of 8; 16 sub-codewords per sub-space, seeded deterministically from
  * the first 16 vectors of the TRAINING corpus. Everything is exact Long
  * arithmetic (floor fixed-point, integer squared distances, lowest-id
  * tie-break), so an incrementally-encoded index is bit-identical to a
  * batch rebuild — the property the streaming spec asserts.
  */
object PqIndex {

  val Micro = 1000000L

  /** Fixed-point quantization of an `embedding` array column. */
  def quantized = transform(col("embedding"),
    x => floor(x.cast("double") * Micro).cast("long"))

  /** Explode a quantized corpus into M=8 sub-vectors per vector:
    * (vec_id, m, sub). */
  def subVectors(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("m"), col("qe"))
      .withColumn("sub", slice(col("qe"), col("m") * 8 + 1, lit(8)))
      .select(col("vec_id"), col("m"), col("sub"))

  /** The 8×16 sub-codebook: sub-vectors of the first 16 training
    * vectors, broadcast (it is tiny and read by every encode). */
  def codebook(training: DataFrame): DataFrame =
    broadcast(subVectors(training).filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("cw_id"), col("sub").as("cw")))

  /** Exact integer squared distance between the `sub` and `cw` array
    * columns in scope. */
  def subDist2 = aggregate(
    zip_with(col("sub"), col("cw"), (a, b) => (a - b) * (a - b)),
    lit(0L), (acc, x) => acc + x)

  /** Encode vectors against a codebook: per (vector, sub-space), the
    * argmin codeword (ties to the lowest codeword id). One broadcast
    * join + one partial-agged argmin aggregate — row-local math, no
    * corpus-wide state, which is why the same call serves a 100 TB
    * batch build and a per-micro-batch incremental append. */
  def encode(vectors: DataFrame, cb: DataFrame): DataFrame =
    subVectors(vectors).join(cb, "m")
      .withColumn("d2", subDist2)
      // argmin as min over the packed long d2*16 + cw_id (the LabelProp
      // packed-argmax trick, r12): min(struct(d2, cw_id)) has a struct
      // aggregation buffer, which is not hash-aggregable and planned as
      // two SortAggregates over the N x 8 x 16 candidate rows. The
      // packing is exact: d2 <= 8 * (2e6)^2 = 3.2e13, so d2*16 + cw_id
      // < 2^63, and min decodes to (d2 asc, cw_id asc) — the identical
      // lowest-id tie-break.
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("d2") * 16L + col("cw_id")).as("packed"))
      .select(col("vec_id"), col("m"), (col("packed") % 16L).as("code"))
}
