package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) with a
  * SIZE-GATED exchange strategy — the 100 TB fix for the one shape the
  * round-9 audit called weak: broadcasting an O(|nodes|) label table
  * into every round.
  *
  * Both modes run the identical algorithm: every node starts labeled
  * with its own id; each synchronous round relabels every node with the
  * most frequent label among its neighbors, ties broken at the SMALLEST
  * label (a total order, so a fixed round count is fully deterministic
  * and both modes agree bit-for-bit with each other and with the
  * unrolled SQL oracle). The argmax is one HASH aggregate over the
  * packed long `freq·2³¹ + (2³¹−1−label)` — max of the packing decodes
  * to the (freq desc, label asc) pick while staying inside whole-stage
  * codegen (valid while labels < 2³¹ and per-(node,label) frequencies
  * < 2³²).
  *
  * The two exchange strategies:
  *
  *  - '''broadcast''' (small label tables): edges hash-partitioned on
  *    `dst` ONCE and cached; each round broadcasts the label table into
  *    the join, and both aggregates then satisfy the dst clustering —
  *    the census groups by (dst, lbl) and the argmax by dst, so every
  *    round is EXCHANGE-FREE. Optimal while |nodes| fits an executor
  *    (fixture graphs, dimension-sized graphs).
  *
  *  - '''shuffle''' (the 100 TB mode): edges hash-partitioned on `src`
  *    ONCE and cached — the Σdeg-sized side NEVER moves again. Each
  *    round shuffles only the |nodes|-sized label table onto `src`
  *    (forced `shuffle_hash` join so the planner can never "helpfully"
  *    broadcast a growing label table), then the census and argmax
  *    exchanges carry only map-side-combined (node, label) partials —
  *    bounded by the census, not by Σdeg. Per-round exchanged bytes are
  *    O(|nodes| + |census|); on a 10⁹-node graph that is the standard
  *    Pregel round, where the broadcast mode would ship gigabytes of
  *    labels to every executor every round.
  *
  * [[propagate]] gates between them on the measured node count (one
  * cheap distinct-count over the cached edge set — the same table the
  * algorithm needs materialized anyway). LabelPropSpec proves the modes
  * produce identical labelings and pins both round plans.
  */
object LabelProp {

  /** Default gate: ~16 bytes/label row ⇒ 1 M labels ≈ 16 MB broadcast
    * per round — at the edge of what repeated per-round broadcasts can
    * justify; beyond it the shuffle round is strictly cheaper. */
  val DefaultBroadcastMaxLabels: Long = 1000000L

  /** The gate, as a pure function so the spec can pin it. */
  def useBroadcast(nLabels: Long, broadcastMaxLabels: Long): Boolean =
    nLabels <= broadcastMaxLabels

  /** ONE synchronous round: relabel every node with the most frequent
    * neighbor label (smallest label on ties). Exposed so specs can pin
    * each mode's round plan — the loop checkpoints labels per round,
    * which cuts the lineage the executed plan would otherwise show.
    *
    * @param edges symmetric (src, dst); pre-partition + cache at the
    *              call site (dst for broadcast mode, src for shuffle)
    * @param lbl   (node, lbl) current labeling
    */
  def round(edges: DataFrame, lbl: DataFrame, broadcastLabels: Boolean): DataFrame = {
    val labelsOnSrc = lbl.withColumnRenamed("node", "src")
    val joined =
      if (broadcastLabels) edges.join(broadcast(labelsOnSrc), "src")
      else edges.join(labelsOnSrc.hint("shuffle_hash"), "src")
    joined
      .groupBy(col("dst").as("node"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      // argmax(freq, then smallest label) as one HASH aggregate:
      // max of the packed long decodes to the (c desc, lbl asc) pick
      .groupBy(col("node"))
      .agg(max(expr("c * 2147483648L + (2147483647L - lbl)")).as("packed"))
      .select(col("node"), expr("2147483647L - packed % 2147483648L").as("lbl"))
  }

  /** Broadcast mode: exchange-free rounds, valid while the label table
    * fits an executor. Labels are checkpointed per round so each round's
    * broadcast reads a materialized table instead of re-executing every
    * prior round. */
  def propagateBroadcast(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.repartition(col("dst")).cache() // partitioning-visible, unlike an RDD checkpoint
    var lbl = initialLabels(e)
    // the graph is symmetric, so every node has >= 1 neighbor and
    // appears in every round's output; localCheckpoint keeps lineage flat
    for (_ <- 1 to rounds) lbl = round(e, lbl, broadcastLabels = true).localCheckpoint()
    lbl
  }

  /** Shuffle mode: the Σdeg-sized edge side is partitioned on src once
    * and never exchanged again; each round moves only the label table
    * and census-sized aggregate partials. */
  def propagateShuffle(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.repartition(col("src")).cache()
    var lbl = initialLabels(e)
    for (_ <- 1 to rounds) lbl = round(e, lbl, broadcastLabels = false).localCheckpoint()
    lbl
  }

  /** Size-gated propagation: measure |nodes| on the cached edge set,
    * then run the mode that survives that size. Both modes compute the
    * identical deterministic labeling. */
  def propagate(edges: DataFrame, rounds: Int,
                broadcastMaxLabels: Long = DefaultBroadcastMaxLabels): DataFrame = {
    val e = edges.cache()
    val nLabels = e.select(col("src")).distinct().count()
    if (useBroadcast(nLabels, broadcastMaxLabels)) propagateBroadcast(e, rounds)
    else propagateShuffle(e, rounds)
  }

  private def initialLabels(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
}
