package graft

import graft.ops.Bfs
import org.apache.spark.sql.functions._

/** Level-synchronous BFS vs in-memory BFS, plus the property it exists
  * for: on a diamond lattice the recursive-CTE formulation carries one
  * row per PATH (2^layers before the final min-hop GROUP BY) while this
  * operator's per-level frontier stays node-bounded. */
class BfsSpec extends SparkSpecBase {
  import spark.implicits._

  private def referenceBfs(edges: Seq[(String, String)], src: String): Map[String, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = Seq(src)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      next.foreach(n => dist(n) = dist(frontier.head) + 1)
      frontier = next
    }
    dist.toMap
  }

  /** k diamond layers: a_i -> {b_(i+1), c_(i+1)} -> a_(i+1). Path count to
    * a_k is 2^k; node count is 3k+1. */
  private def diamondLattice(k: Int): Seq[(String, String)] =
    (0 until k).flatMap { i =>
      Seq(s"a$i" -> s"b${i + 1}", s"a$i" -> s"c${i + 1}",
        s"b${i + 1}" -> s"a${i + 1}", s"c${i + 1}" -> s"a${i + 1}")
    }

  test("diamond lattice: 2^12 paths, but every frontier stays node-bounded (<= 2)") {
    val k = 12
    val res = Bfs.run(diamondLattice(k).toDF("src", "dst"), "a0", maxHops = 2 * k)
    val got = res.distances.as[(String, Long)].collect().toMap
    assert(got(s"a$k") == 2L * k)
    assert(got(s"b$k") == 2L * k - 1)
    assert(got.size == 3 * k + 1)
    // the whole point: path count is 4096 here, frontiers never exceed 2
    assert(res.frontierSizes.max <= 2,
      s"frontier grew path-shaped: ${res.frontierSizes}")
  }

  test("cycle + cross edges: min-hop distances match the in-memory reference") {
    val edges = Seq("x" -> "y", "y" -> "z", "z" -> "x", // 3-cycle
      "x" -> "z", // shortcut: z at hop 1, not 2
      "z" -> "w", "w" -> "y") // re-entry into visited nodes
    val got = Bfs.distances(edges.toDF("src", "dst"), "x", maxHops = 10)
      .as[(String, Long)].collect().toMap
    assert(got == referenceBfs(edges, "x"))
  }

  test("maxHops caps the traversal; unreachable nodes are absent") {
    val edges = Seq("p" -> "q", "q" -> "r", "r" -> "s", "isolated1" -> "isolated2")
    val got = Bfs.distances(edges.toDF("src", "dst"), "p", maxHops = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("p" -> 0L, "q" -> 1L, "r" -> 2L)) // s beyond cap, isolated* unreachable
  }

  test("numeric node ids work (the column type follows the edge schema)") {
    val got = Bfs.distances(Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst"), 1L, maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
