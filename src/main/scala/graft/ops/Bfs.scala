package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous BFS with LEVEL-WISE DEDUP — the node-bounded
  * companion to the recursive-CTE reachability query (a12_reachability).
  *
  * A recursive CTE's working set is PATH-count-sized: on a diamond
  * lattice (two parallel arcs per layer) the recursive member carries
  * 2^layers rows before the final `GROUP BY min(hop)` collapses them —
  * fine at depth 4 on a sparse graph, catastrophic on 100 TB of edges.
  * This operator instead materializes one FRONTIER per level and
  * deduplicates it before expanding:
  *
  *   next = distinct(frontier ⋈ edges).anti_join(visited)
  *
  * so every level's working set is bounded by |V|, never by path count.
  * Rounds cost two hash shuffles each (the expand join + the distinct);
  * the edge side is pre-partitioned on `src` once and cached, so its
  * exchange is planned away across levels — the same invariant-side
  * trick ConnectedComponents uses.
  *
  * Reference semantics: min-hop distances, the same answer as
  * `WITH RECURSIVE ... GROUP BY node -> min(hop)` (level-synchronous
  * BFS discovers every node at its minimal depth by construction).
  */
object Bfs {

  /** Distances plus per-level frontier sizes, so callers (and specs) can
    * assert the node-bounded property instead of trusting it. */
  final case class Result(distances: DataFrame, frontierSizes: Seq[Long])

  /** @param edges   two columns `src`, `dst` — DIRECTED (symmetrize at the
    *                call site for undirected reachability)
    * @param source  start node id (same type as src/dst)
    * @param maxHops inclusive depth cap; level-synchronous, so the cap
    *                bounds the round count exactly
    * @return (node, hops) with hops = min-hop distance, source at 0
    */
  def distances(edges: DataFrame, source: Any, maxHops: Int): DataFrame =
    run(edges, source, maxHops).distances

  def run(edges: DataFrame, source: Any, maxHops: Int): Result = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val adj = edges.select(col("src"), col("dst")).repartition(col("src")).cache()
    try {
      import org.apache.spark.sql.Row
      val srcType = adj.schema("src").dataType
      val start = spark.createDataFrame(
        java.util.List.of(Row(source)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", srcType, nullable = false))))
      // visited doubles as the output: (node, hops) accumulated per level.
      // Lazy checkpoints (r12 optimization, the ConnectedComponents
      // discipline): each level's size count is the ONE job that both
      // materializes the level's checkpoint and measures it — the old
      // eager localCheckpoint ran a redundant job per level, and a THIRD
      // job re-checkpointed `visited`, which is only ever a flat union
      // of already-checkpointed level frames (nothing to truncate).
      // 3 jobs/level -> 1 job/level, identical frontier math.
      var visited = start.withColumn("hops", lit(0L))
      var frontier = start
      val sizes = scala.collection.mutable.ArrayBuffer[Long](frontier.count())
      var hop = 0L
      while (hop < maxHops && sizes.last > 0) {
        hop += 1
        // expand -> LEVEL-WISE DEDUP (distinct) -> drop already-visited:
        // the anti-join is what keeps cyclic/diamond graphs node-bounded
        val next = adj.join(frontier.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .localCheckpoint(false)
        sizes += next.count()
        visited = visited.unionAll(next.withColumn("hops", lit(hop)))
        frontier = next
      }
      Result(visited, sizes.toSeq)
    } finally {
      adj.unpersist()
    }
  }
}
