package graft

import graft.queries.{QueryRegistry, SourceQueries}
import org.apache.spark.sql.functions._

/** Regression for the div-vs-floor divergence class: `s9_zorder_layout`
  * quantizes with a min-shift so the integer division's numerator is
  * never negative — the regime where Spark's truncating `div` and the
  * DuckDB oracle's flooring `//` agree. This spec model-checks the
  * whole stats pipeline in Scala (Math.floorDiv everywhere) on inputs
  * the parquet fixtures never produce: events BEFORE the 2024-01-01
  * anchor (negative hours) and negative user ids. If anyone reverts to
  * unshifted `div`, the negative-domain rows land in the wrong files
  * and the model comparison fails. */
class ZorderQuantizationSpec extends SparkSpecBase {

  private case class P(u: Long, h: Long)

  /** The same math as SourceQueries.zorderStats, floor-division end to
    * end — what BOTH engines must compute. */
  private def model(pts: Seq[P]): Map[String, (Long, Long, Long)] = {
    val (mnu, mu) = (pts.map(_.u).min, pts.map(_.u).max)
    val (mnh, mh) = (pts.map(_.h).min, pts.map(_.h).max)
    val filed = pts.map { p =>
      val u8 = Math.floorDiv((p.u - mnu) * 256, mu - mnu + 1)
      val h8 = Math.floorDiv((p.h - mnh) * 256, mh - mnh + 1)
      val z = (0 until 8).map(i =>
        Math.floorDiv(u8, 1L << i) % 2 * (1L << (2 * i)) +
          Math.floorDiv(h8, 1L << i) % 2 * (1L << (2 * i + 1))).sum
      (p, Math.floorDiv(z, 2048L), Math.floorDiv(h8 * 32, 256L))
    }
    def agg(layout: String, key: ((P, Long, Long)) => Long) = {
      val byFile = filed.groupBy(key).map { case (_, rs) =>
        (rs.map(_._1.u).min, rs.map(_._1.u).max, rs.map(_._1.h).min, rs.map(_._1.h).max)
      }.toSeq
      layout -> (byFile.size.toLong,
        byFile.count(f => f._1 <= 7 && f._2 >= 7).toLong,
        byFile.count(f => f._3 <= 115 && f._4 >= 100).toLong)
    }
    Map(agg("zorder", _._2), agg("linear", _._3))
  }

  private def run(pts: Seq[P]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    val e = pts.map(p => (p.u, p.h)).toDF("u", "h")
    SourceQueries.zorderStats(e).collect().map(r =>
      r.getAs[String]("layout") -> (r.getAs[Long]("n_files"),
        r.getAs[Long]("files_user_q"), r.getAs[Long]("files_time_q"))).toMap
  }

  test("negative anchor: pre-2024 hours and negative user ids quantize " +
    "floor-consistently (engine == floorDiv model)") {
    // hours straddle the anchor (h in [-120, 130]) and users straddle 0;
    // h=-120..-1 are the "pre-2024 event" class the old truncating
    // quantization silently mis-filed.
    val pts = for (i <- 0 until 400) yield
      P(u = (i * 37 % 41) - 17L, h = (i * 53 % 251) - 120L)
    assert(pts.exists(_.h < 0) && pts.exists(_.u < 0) && pts.exists(_.h > 0))
    assert(run(pts) == model(pts))
  }

  test("fixture-domain (non-negative) input still matches the model") {
    val pts = for (i <- 0 until 300) yield
      P(u = i * 13 % 29L, h = i * 7 % 240L)
    assert(run(pts) == model(pts))
  }

  test("s9_zorder_layout on the fixture keeps the pruning inequality") {
    val rows = QueryRegistry.queries("s9_zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("files_user_q"))).toMap
    assert(rows("zorder")._2 < rows("linear")._2, s"pruning lost: $rows")
  }
}
