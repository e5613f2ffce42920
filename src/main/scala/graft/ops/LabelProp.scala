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
  * codegen (valid while labels < 2³¹ — guarded loudly at entry — and
  * per-(node,label) frequencies < 2³²).
  *
  * BOTH modes run over ONE src-hash-partitioned cached edge table —
  * single materialization, unpersisted in an epilogue once the final
  * labels are checkpointed. The edge set is symmetric (a requirement of
  * LPA itself: neighbor label multisets must be undirected), which is
  * what lets the two exchange strategies share the partitioning:
  *
  *  - '''broadcast''' (small label tables): each round broadcasts the
  *    label table keyed on `dst` into the join (neighbor labels arrive
  *    along out-edges — the same multiset, by symmetry), and both
  *    aggregates then group by `src`, satisfied by the src clustering —
  *    every round is EXCHANGE-FREE. Optimal while |nodes| fits an
  *    executor (fixture graphs, dimension-sized graphs).
  *
  *  - '''shuffle''' (the 100 TB mode): each round shuffles only the
  *    |nodes|-sized label table onto `src` (forced `shuffle_hash` join
  *    so the planner can never "helpfully" broadcast a growing label
  *    table) — the Σdeg-sized edge side NEVER moves — then the census
  *    and argmax exchanges carry only map-side-combined (node, label)
  *    partials, bounded by the census, not by Σdeg. Per-round exchanged
  *    bytes are O(|nodes| + |census|); on a 10⁹-node graph that is the
  *    standard Pregel round, where the broadcast mode would ship
  *    gigabytes of labels to every executor every round.
  *
  * [[propagate]] gates between them on the measured node count — one
  * distinct-count read FROM the already-partitioned cache (co-located,
  * so the count itself is exchange-free). LabelPropSpec proves the
  * modes produce identical labelings and pins both round plans.
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
    * @param edges symmetric (src, dst), pre-partitioned on src + cached
    *              at the call site (both modes share that layout)
    * @param lbl   (node, lbl) current labeling
    */
  def round(edges: DataFrame, lbl: DataFrame, broadcastLabels: Boolean): DataFrame = {
    // argmax(freq, then smallest label) as one HASH aggregate: max of
    // the packed long decodes to the (c desc, lbl asc) pick
    def argmax(census: DataFrame): DataFrame = census
      .groupBy(col("node"))
      .agg(max(expr("c * 2147483648L + (2147483647L - lbl)")).as("packed"))
      .select(col("node"), expr("2147483647L - packed % 2147483648L").as("lbl"))
    if (broadcastLabels) {
      // neighbor labels arrive along OUT-edges (join on dst; identical
      // multiset by symmetry), so census and argmax both group on src
      // and ride the cache's src clustering — zero exchanges per round
      val labelsOnDst = lbl.withColumnRenamed("node", "dst")
      argmax(edges.join(broadcast(labelsOnDst), "dst")
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c")))
    } else {
      // labels shuffle onto src (the edge side never moves); census and
      // argmax exchange only map-side-combined partials
      val labelsOnSrc = lbl.withColumnRenamed("node", "src")
      argmax(edges.join(labelsOnSrc.hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c")))
    }
  }

  /** Broadcast mode: exchange-free rounds, valid while the label table
    * fits an executor. */
  def propagateBroadcast(edges: DataFrame, rounds: Int): DataFrame =
    runRounds(prepare(edges), rounds, broadcastLabels = true)

  /** Shuffle mode: the Σdeg-sized edge side is partitioned on src once
    * and never exchanged again; each round moves only the label table
    * and census-sized aggregate partials. */
  def propagateShuffle(edges: DataFrame, rounds: Int): DataFrame =
    runRounds(prepare(edges), rounds, broadcastLabels = false)

  /** Size-gated propagation: measure |nodes| FROM the partitioned cache
    * both modes share (a co-partitioned distinct-count — no second
    * materialization, no extra exchange), then run the mode that
    * survives that size. Both modes compute the identical deterministic
    * labeling. */
  def propagate(edges: DataFrame, rounds: Int,
                broadcastMaxLabels: Long = DefaultBroadcastMaxLabels): DataFrame = {
    val e = prepare(edges)
    // ONE distinct pass serves both the gate count and round 1's initial
    // labels (r12 optimization): the count() materializes the lazy
    // checkpoint, and runRounds starts from the same node table —
    // previously the gate's distinct+count and initialLabels each ran
    // their own full distinct over the edge cache.
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint(false)
    val nLabels = nodes.count()
    runRounds(e, rounds, useBroadcast(nLabels, broadcastMaxLabels),
      Some(nodes.select(col("node"), col("node").as("lbl"))))
  }

  /** The single materialization both modes (and the gate) read:
    * src-partitioned cached DISTINCT edges, with the id-domain guard
    * doubling as the materializing action.
    *
    * The dedup lives HERE, fused behind the layout exchange (r12
    * optimization): LPA is defined on an edge SET (each neighbor
    * contributes its label once), and hashing the raw pair stream out
    * on `src` FIRST lets the distinct aggregate run in place — its
    * ClusteredDistribution(src, dst) is satisfied by the src hash
    * partitioning (subset rule) — so edge prep pays ONE exchange where
    * a caller-side `.distinct()` followed by this repartition paid two.
    * Already-distinct inputs are unchanged (dedup is idempotent). */
  private def prepare(edges: DataFrame): DataFrame = {
    val e = edges.repartition(col("src")).distinct().cache() // partitioning-visible, unlike an RDD checkpoint
    guardIds(e)
    e
  }

  /** The round loop over an already-prepared cache, with the unpersist
    * epilogue: labels are EAGERLY localCheckpoint-ed per round (flat
    * lineage, materialized by the time the loop exits — the graph is
    * symmetric, so every node has >= 1 neighbor and appears in every
    * round's output), so the edge cache can be released before
    * returning and composing LabelProp inside a longer job never pays
    * lingering edge memory. */
  private def runRounds(e: DataFrame, rounds: Int, broadcastLabels: Boolean,
                        init: Option[DataFrame] = None): DataFrame = {
    var lbl = init.getOrElse(initialLabels(e))
    for (_ <- 1 to rounds) lbl = round(e, lbl, broadcastLabels).localCheckpoint()
    e.unpersist(blocking = false)
    lbl
  }

  /** Loud runtime guard for the packed-argmax domain: the packing
    * `c·2³¹ + (2³¹−1−lbl)` silently decodes to a WRONG label if any node
    * id is negative or ≥ 2³¹ — plausible on 10⁹-node graphs with hashed
    * or sequence-gapped long ids — so out-of-range ids must fail the job
    * instead of producing a plausible-but-wrong labeling. One cheap
    * min/max aggregate over the already-partitioned edge cache (its
    * materializing action, so the guard costs no extra pass). */
  private def guardIds(e: DataFrame): Unit = {
    // min/max BOTH endpoints in the one pass: on a correctly symmetric
    // edge set the domains coincide, but an (erroneous) asymmetric input
    // with out-of-range dst ids would otherwise slip past a src-only
    // guard and decode wrong labels — the exact silent failure this
    // guard exists to make loud
    val r = e.agg(min(col("src").cast("long")).as("slo"),
      max(col("src").cast("long")).as("shi"),
      min(col("dst").cast("long")).as("dlo"),
      max(col("dst").cast("long")).as("dhi")).head()
    if (!r.isNullAt(0)) {
      val (lo, hi) = (math.min(r.getLong(0), r.getLong(2)),
        math.max(r.getLong(1), r.getLong(3)))
      require(lo >= 0L && hi < 2147483648L,
        s"LabelProp packed argmax requires node ids in [0, 2^31); edge set has [$lo, $hi]. " +
          "Remap ids (e.g. dense_rank over nodes) before propagating.")
    }
  }

  private def initialLabels(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
}
