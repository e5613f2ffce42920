package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join by time binning — the second temporal join
  * Spark has no native operator for (the first is [[AsOfJoin]]).
  *
  * A naive overlap join (`l.start <= r.end AND r.start <= l.end`) has no
  * equi-key for Catalyst, so it plans as a nested-loop/cartesian per key
  * — quadratic in the hot key's row count. Binning restores a hash join:
  * every interval explodes to the fixed-width time bins it touches, the
  * two sides equi-join on (keys…, bin), the exact overlap predicate
  * filters bin-collisions, and a distinct pass drops the duplicate
  * matches of pairs that co-occupy several bins.
  *
  * Cost model: explode factor = avg(interval span / binWidth) + 1, so
  * pick the bin near the TYPICAL interval length — too-small bins
  * multiply rows, too-large bins degrade selectivity toward the naive
  * join. The shuffle key is (keys…, bin): time-skew (rush hours) spreads
  * across bins by construction, and a hot (key, bin) falls to AQE like
  * any other hash-join skew.
  */
object OverlapJoin {

  /** Inner overlap join of `left` and `right` on equal `keys` and
    * overlapping [startCol, endCol] intervals (closed ends: touching
    * intervals match with overlap 0). Interval columns must be integral
    * (epoch ms). Emits all left columns, all right columns (which must
    * not collide — prefix them), plus `overlap_ms`. */
  def binnedOverlapJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], binWidthMs: Long,
      lStart: String, lEnd: String, rStart: String, rEnd: String): DataFrame = {
    require(binWidthMs > 0, s"binWidthMs must be positive, got $binWidthMs")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        (col(s) / binWidthMs).cast("long"), (col(e) / binWidthMs).cast("long"))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, keys :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin")
      .distinct() // a pair sharing n bins matched n times
      .withColumn("overlap_ms",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
  }
}
