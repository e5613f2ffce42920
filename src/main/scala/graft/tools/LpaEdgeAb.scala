package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LPA edge-build A/B the round-11 verdict asked for (wrong #1):
  * commit b748bf3 switched the part co-occurrence edge build from the
  * join-shaped form (distinct + size census + double self-join, five
  * exchanges) to the collect_set form (basket aggregate + row-local pair
  * expansion, two exchanges) and claimed it faster, while the committed
  * cross-round bench showed a12_label_propagation 1.79→2.90 s — both
  * can be true only if the fixtures drifted (they regenerate every
  * round). This main settles it the way cross-round timing cannot: both
  * builds run INTERLEAVED in ONE JVM on THIS round's fixtures (min-of-3
  * per side after warm-up, the ScaleBench discipline), both for the raw
  * edge materialization and for the full 3-round gated propagation, and
  * the edge sets are proven identical before any timing is reported.
  * Prints ONE JSON line and writes it to the artifact path.
  *
  * Usage: sbt "runMain graft.tools.LpaEdgeAb [sfDir] [outJson]"
  */
object LpaEdgeAb {

  /** The round-10 join-shaped build, verbatim from git history
    * (GraphQueries.coOccurrenceEdges before b748bf3). */
  private def edgesJoinShaped(t: Tables): DataFrame = {
    val items = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val keep = items.groupBy(col("o")).agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 6))
      .select(col("o"))
    val kept = items.join(keep, "o")
    kept.select(col("o"), col("p").as("src"))
      .join(kept.select(col("o"), col("p").as("dst")), Seq("o"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /** The round-11 collect_set build, verbatim from
    * GraphQueries.coOccurrenceEdges today. */
  private def edgesCollectSet(t: Tables): DataFrame = {
    val baskets = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o"))
      .agg(collect_set(col("p")).as("ps"))
      .filter(size(col("ps")).between(2, 6))
    baskets
      .select(explode(expr(
        "flatten(transform(ps, x -> transform(filter(ps, y -> y != x), y -> struct(x AS src, y AS dst))))"))
        .as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outJson = if (args.length > 1) args(1)
      else "/root/repo/scale/lpa_edge_ab_r12.json"
    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg
    val spark = GraftSession.local("graft-lpa-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    // the two builds must be the SAME edge set, or the timing compares
    // different work
    val nOld = edgesJoinShaped(t).count()
    val nNew = edgesCollectSet(t).count()
    val diff = edgesJoinShaped(t).exceptAll(edgesCollectSet(t)).count() +
      edgesCollectSet(t).exceptAll(edgesJoinShaped(t)).count()
    require(nOld == nNew && diff == 0,
      s"edge sets differ: old=$nOld new=$nNew symdiff=$diff")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def lpa(edges: DataFrame): Unit = {
      graft.ops.LabelProp.propagate(edges, rounds = 3).count()
      spark.catalog.clearCache()
    }

    // warm-up both sides (scan cache, codegen), then 3 interleaved pairs
    // per measurement so host drift hits both sides equally
    time(edgesJoinShaped(t).count()); time(edgesCollectSet(t).count())
    lpa(edgesJoinShaped(t)); lpa(edgesCollectSet(t))
    val edgeOld = (1 to 3).map(_ => time(edgesJoinShaped(t).count()))
    val edgeNew = (1 to 3).map(_ => time(edgesCollectSet(t).count()))
    val runsOld = scala.collection.mutable.ArrayBuffer[Double]()
    val runsNew = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 3) {
      runsOld += time(lpa(edgesJoinShaped(t)))
      runsNew += time(lpa(edgesCollectSet(t)))
    }
    val line = s"""{"probe":"lpa_edge_ab","sf":"$sfDir","n_edges":$nNew,""" +
      s""""edge_sets_identical":true,""" +
      s""""edge_join_shaped_sec":${edgeOld.min},"edge_collect_set_sec":${edgeNew.min},""" +
      s""""lpa_join_shaped_sec":${runsOld.min},"lpa_collect_set_sec":${runsNew.min},""" +
      s""""edge_ratio_old_over_new":${edgeOld.min / edgeNew.min},""" +
      s""""lpa_ratio_old_over_new":${runsOld.min / runsNew.min},""" +
      s""""loadavg_start":$loadStart,"loadavg_end":$loadavg}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line + "\n")
    spark.stop()
  }
}
