package graft

import graft.ops.GridJoin
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded-random model check (the AsOfJoinRandomSpec style): over many
  * random point sets — including negative coordinates, duplicate
  * positions, and radius values that don't divide the coordinate
  * range — the grid-bucketed join must return EXACTLY the naive
  * O(n²) cross join's qualifying pairs, each exactly once. */
class GridJoinRandomSpec extends SparkSpecBase {

  test("grid join equals the naive quadratic join over random configurations") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for (round <- 1 to 12) {
      val n = 20 + rnd.nextInt(120)
      val span = 50 + rnd.nextInt(500)
      val radius = 1L + rnd.nextInt(60)
      val offset = rnd.nextInt(300) - 150 // exercise negative coordinates
      val pts = (0 until n).map(i =>
        (i.toLong, (rnd.nextInt(span) + offset).toLong, (rnd.nextInt(span) + offset).toLong))
      val df = pts.toDF("id", "x", "y")

      val grid = GridJoin.neighborPairs(df, radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val naive = (for {
        a <- pts; b <- pts if a._1 < b._1
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= radius * radius
      } yield (a._1, b._1, d2)).toSet

      assert(grid == naive,
        s"round $round (n=$n span=$span r=$radius off=$offset): " +
          s"grid-only=${(grid -- naive).take(3)} naive-only=${(naive -- grid).take(3)}")

      // exactly-once: the DataFrame row count equals the set size
      assert(GridJoin.neighborPairs(df, radius).count() == naive.size,
        s"round $round: duplicate pairs emitted")
    }
  }
}
