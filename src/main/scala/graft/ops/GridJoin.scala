package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed distance self-join — the spatial analogue of the LSH
  * band join (and of every "points within r" join a geo pipeline runs):
  * points land in radius-sized cells, ONE side explodes to its 3×3 cell
  * neighborhood, candidates come from a hash equi-join on the cell key,
  * and the exact distance predicate runs only on neighbor-cell
  * candidates — never all-pairs.
  *
  * Pair uniqueness: a qualifying pair (i < j) matches exactly once,
  * through the NON-exploded member's own cell (the exploded member
  * covers that cell exactly once among its nine offsets, and the
  * reversed candidate fails i < j) — so no dedup pass is needed.
  *
  * Scale: the shuffle key is the cell id; the 9× expansion of one side
  * replaces the O(n²) cross join, and cell size = radius keeps the
  * candidate ring minimal (all true pairs are within one cell of each
  * other; the exact predicate discards the corner excess).
  */
object GridJoin {

  /** @param points columns (id: long, x: int/long, y: int/long) —
    *               integer coordinates so distances are exact Longs.
    *               Ids MUST be distinct: the exactly-once guarantee
    *               hangs on `i < j`, so two rows sharing an id at
    *               different coordinates would silently drop their
    *               mutual pair (id-equal candidates fail i < j).
    *               Disambiguate with a row index first if ids can
    *               repeat.
    *               Negative coordinates are fine: `div` truncates toward
    *               zero (the cell straddling zero is 2r−1 wide instead
    *               of r), but cell boundaries stay >= r apart, so two
    *               points within r still differ by at most one cell
    *               index per axis and the 3×3 ring remains complete —
    *               GridJoinRandomSpec exercises negative offsets.
    * @param radius inclusive distance bound (same unit as x/y); also the
    *               cell edge
    * @return (i, j, d2) with i < j and d2 = squared distance <= radius²
    */
  def neighborPairs(points: DataFrame, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val r = lit(radius)
    val left = points.select(col("id").as("i"),
      col("x").cast("long").as("x_i"), col("y").cast("long").as("y_i"),
      expr(s"x div $radius").as("cx"), expr(s"y div $radius").as("cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val right = points.select(col("id").as("j"),
        col("x").cast("long").as("x_j"), col("y").cast("long").as("y_j"),
        explode(offsets).as("o"))
      .select(col("j"), col("x_j"), col("y_j"),
        (expr(s"x_j div $radius") + col("o.dx")).as("cx"),
        (expr(s"y_j div $radius") + col("o.dy")).as("cy"))
    left.join(right, Seq("cx", "cy"))
      .filter(col("i") < col("j"))
      .withColumn("d2",
        (col("x_i") - col("x_j")) * (col("x_i") - col("x_j")) +
          (col("y_i") - col("y_j")) * (col("y_i") - col("y_j")))
      .filter(col("d2") <= r * r)
      .select(col("i"), col("j"), col("d2"))
  }
}
