package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized model check for the as-of join: on seeded random inputs
  * (dense timestamp collisions, keys with no build rows, both
  * directions, with and without tolerance) the distributed operator must
  * equal an obviously-correct in-memory reference. */
class AsOfJoinRandomSpec extends SparkSpecBase {
  import spark.implicits._

  private case class Ref(k: Int, t: Long, v: Long, asofT: Option[Long], asofTag: Option[Long])

  private def reference(probe: Seq[(Int, Long, Long)], build: Map[(Int, Long), Long],
                        forward: Boolean, tol: Option[Long]): Set[Ref] =
    probe.map { case (k, t, v) =>
      val cands = build.collect {
        case ((bk, bt), tag) if bk == k &&
          (if (forward) bt >= t else bt <= t) &&
          tol.forall(d => if (forward) bt <= t + d else bt >= t - d) => (bt, tag)
      }
      val pick =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._1) else cands.maxBy(_._1))
      Ref(k, t, v, pick.map(_._1), pick.map(_._2))
    }.toSet

  test("random inputs: both directions and tolerance match the in-memory model") {
    for (seed <- Seq(1, 7, 42, 1234)) {
      val rnd = new Random(seed)
      // dense ts range forces equal-instant probe/build collisions
      val probe = Seq.fill(80)((rnd.nextInt(6), rnd.nextInt(40).toLong, rnd.nextLong(1000)))
      val build = Seq.fill(60)((rnd.nextInt(8), rnd.nextInt(40).toLong, rnd.nextLong(1000)))
        .groupBy(r => (r._1, r._2)).map { case (kt, rs) => kt -> rs.map(_._3).max }

      val pDf = probe.toDF("k", "t", "v")
      val bDf = build.toSeq.map { case ((k, t), tag) => (k, t, tag) }.toDF("k", "t", "tag")

      for {
        forward <- Seq(false, true)
        tol <- Seq(None, Some(5L))
      } {
        val got = (if (forward)
          AsOfJoin.leftForward(pDf, bDf, Seq("k"), "t", Seq("tag"), tol.map(lit(_)))
        else
          AsOfJoin.leftBackward(pDf, bDf, Seq("k"), "t", Seq("tag"), tol.map(lit(_))))
          .select(col("k"), col("t"), col("v"), col("asof_ts"), col("asof_tag"))
          .collect()
          .map(r => Ref(r.getInt(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))
          .toSet
        val want = reference(probe, build, forward, tol)
        assert(got === want,
          s"seed=$seed forward=$forward tol=$tol: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
      }
    }
  }
}
