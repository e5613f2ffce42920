package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 scale A/B for LabelProp's round-1 fusion, in the shuffle
  * (100 TB) mode: the shipped operator (round 1 = one mode aggregate
  * straight over the edge cache, no initial-labels distinct) against an
  * inline replica of the pre-fusion loop (distinct node census seeding
  * identity labels, round 1 as a full shuffle_hash join round) — on a
  * deterministic synthetic graph big enough to be compute-bound. Both
  * must produce the identical community census.
  *
  * Usage: sbt "runMain graft.tools.LpaScaleAb [nNodes] [mEdges] [rounds]"
  */
object LpaScaleAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val m = if (args.length > 1) args(1).toLong else 4 * n
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("graft-lpa-scale-ab")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // raw directed pair stream; LabelProp.prepare symmetrizes nothing —
    // LPA requires a symmetric edge SET, so emit both directions here
    val raw = spark.range(m)
      .select(
        pmod(xxhash64(col("id")), lit(n)).as("a"),
        pmod(xxhash64(col("id") + m), lit(n)).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = raw.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()

    def census(lbl: DataFrame): Seq[(Long, Long)] =
      lbl.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    def replicaPreFusion(): DataFrame = {
      // the r12 loop: prepare + distinct-census identity init + every
      // round (incl. round 1) a shuffle_hash join + mode aggregate
      val e = edges.repartition(col("src")).distinct().cache()
      var lbl = e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")).localCheckpoint(false)
      for (r <- 1 to rounds) {
        val labelsOnSrc = lbl.withColumnRenamed("node", "src")
        lbl = e.join(labelsOnSrc.hint("shuffle_hash"), "src")
          .groupBy(col("dst").as("node"))
          .agg(mode(col("lbl"), deterministic = true).as("lbl"))
          .localCheckpoint(r == rounds)
      }
      e.unpersist(blocking = false)
      lbl
    }

    val results = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    var ref: Option[Seq[(Long, Long)]] = None
    def leg(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val lbl = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $tag%-18s $secs%8.3f s")
      results(tag) = secs :: results(tag)
      val cs = timed(s"census($tag)")(census(lbl))
      if (ref.isEmpty) ref = Some(cs)
      else if (ref.get != cs) println(s"PROBE CENSUS MISMATCH at $tag")
    }
    // forward then reverse order so JVM warm-up bias cancels
    leg("pre-fusion")(replicaPreFusion())
    leg("shipped r13")(graft.ops.LabelProp.propagateShuffle(edges, rounds))
    leg("shipped r13")(graft.ops.LabelProp.propagateShuffle(edges, rounds))
    leg("pre-fusion")(replicaPreFusion())
    results.toSeq.sortBy(_._1).foreach { case (tag, ss) =>
      println(f"PROBE SUMMARY $tag runs=${ss.reverse.map(s => f"$s%.1f").mkString(",")} min=${ss.min}%.1f")
    }
    spark.stop()
  }
}
