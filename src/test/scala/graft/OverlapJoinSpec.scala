package graft

import graft.ops.OverlapJoin
import org.apache.spark.sql.Row

/** Edge semantics of the binned overlap join: touching intervals,
  * bin-boundary spanning (the dedup path), key isolation, and the
  * non-overlap exclusion. Bin width 10 deliberately forces multi-bin
  * intervals. */
class OverlapJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(l: Seq[(Int, Long, Long)], r: Seq[(Int, Long, Long)]) =
    OverlapJoin.binnedOverlapJoin(
        l.toDF("k", "l_start", "l_end"), r.toDF("k", "r_start", "r_end"),
        keys = Seq("k"), binWidthMs = 10L,
        lStart = "l_start", lEnd = "l_end", rStart = "r_start", rEnd = "r_end")
      .select("k", "l_start", "l_end", "r_start", "r_end", "overlap_ms")
      .collect().toSet

  test("overlap, touch, and disjoint intervals classify correctly across bins") {
    val got = run(
      l = Seq((1, 5L, 25L),   // spans bins 0,1,2 — dedup path
              (1, 40L, 45L),  // contained in [18,60]
              (1, 70L, 75L),  // disjoint from everything
              (2, 5L, 25L)),  // same times, other key — must not match
      r = Seq((1, 18L, 60L),  // overlaps [5,25] by 7, contains [40,45]
              (1, 25L, 30L))) // touches [5,25] at a point: overlap 0
    assert(got === Set(
      Row(1, 5L, 25L, 18L, 60L, 7L),
      Row(1, 5L, 25L, 25L, 30L, 0L),
      Row(1, 40L, 45L, 18L, 60L, 5L)))
  }

  test("a pair sharing many bins is emitted exactly once") {
    val got = run(l = Seq((7, 0L, 99L)), r = Seq((7, 0L, 99L)))
    assert(got === Set(Row(7, 0L, 99L, 0L, 99L, 99L)))
  }
}
