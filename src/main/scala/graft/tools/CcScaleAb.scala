package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 scale A/B for the ConnectedComponents loop variants on a
  * deterministic synthetic graph big enough to be compute-bound rather
  * than latency-bound (the fixture regime) — the regime where a bad
  * trade (e.g. a per-round cache's write cost) shows.
  *
  * Variants (all must produce the identical component census):
  *   fuse=F cache=F — the pre-r13 loop (node-census init, join round 1,
  *                    uncached jump self-join)
  *   fuse=T cache=F — r13 round-1 fusion only
  *   fuse=T cache=T — the full r13 shape (fusion + cached pre-jump)
  *   fuse=F cache=T — cache only
  *
  * Each variant runs twice, in forward then reverse order, so JVM
  * warm-up bias cancels. Graph: `m` edges over `n` nodes, endpoints
  * xxhash64 of the edge index (seeded, Date-free).
  *
  * Usage: sbt "runMain graft.tools.CcScaleAb [nNodes] [mEdges]"
  */
object CcScaleAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val m = if (args.length > 1) args(1).toLong else 4 * n
    val spark = GraftSession.local("graft-cc-scale-ab")
    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-24s $s%8.3f s")
      (r, s)
    }
    val edges = spark.range(m)
      .select(
        pmod(xxhash64(col("id")), lit(n)).as("src"),
        pmod(xxhash64(col("id") + m), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()

    def census(labels: DataFrame): Seq[(Long, Long)] =
      labels.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    def resolve(fuse: Boolean, cacheStepped: Boolean): DataFrame = {
      val sym = edges
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("src"))
        .cache()
      def jump(df: DataFrame): DataFrame = {
        val j = df.select(col("node").as("jnode"), col("lbl").as("jlbl"))
        df.join(j, col("lbl") === col("jnode"), "left")
          .select(col("node"), coalesce(col("jlbl"), col("lbl")).as("lbl"))
      }
      val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
      try {
        var lbl: DataFrame =
          if (fuse) null
          else {
            val nodes = sym.select(col("src").as("node")).distinct()
            nodes.select(col("node"), col("node").as("lbl")).localCheckpoint(false)
          }
        var prevSum: Option[BigDecimal] = None
        var round = 0
        var converged = false
        while (round < 16 && !converged) {
          val stepped =
            if (lbl == null)
              sym.groupBy(col("dst"))
                .agg(least(col("dst"), min(col("src"))).as("lbl"))
                .select(col("dst").as("node"), col("lbl"))
            else {
              val nmin = sym.join(lbl.withColumnRenamed("node", "src"), "src")
                .select(col("dst").as("node"), col("lbl"))
              lbl.union(nmin).groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
            }
          val steppedM = if (cacheStepped) { val c = stepped.cache(); roundCaches += c; c }
                         else stepped
          lbl = jump(steppedM).localCheckpoint(false)
          val s = Option(lbl.agg(sum(col("lbl")).cast("decimal(38,0)")).head().getDecimal(0))
            .map(BigDecimal(_))
          converged = s.isEmpty || prevSum == s
          prevSum = s
          round += 1
        }
        println(s"PROBE   rounds=$round converged=$converged")
        lbl.localCheckpoint()
      } finally {
        sym.unpersist()
        roundCaches.foreach(_.unpersist(blocking = false))
      }
    }

    val variants = Seq(
      ("fuse=F cache=F", false, false),
      ("fuse=T cache=F", true, false),
      ("fuse=T cache=T", true, true),
      ("fuse=F cache=T", false, true))
    val results = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    var ref: Option[Seq[(Long, Long)]] = None
    for (pass <- Seq(variants, variants.reverse)) {
      for ((tag, f, c) <- pass) {
        val (labels, secs) = timed(tag)(resolve(f, c))
        results(tag) = secs :: results(tag)
        val cs = census(labels)
        if (ref.isEmpty) ref = Some(cs)
        else if (ref.get != cs) println(s"PROBE CENSUS MISMATCH at $tag")
      }
    }
    results.toSeq.sortBy(_._1).foreach { case (tag, ss) =>
      println(f"PROBE SUMMARY $tag runs=${ss.reverse.map(s => f"$s%.1f").mkString(",")} min=${ss.min}%.1f")
    }
    spark.stop()
  }
}
