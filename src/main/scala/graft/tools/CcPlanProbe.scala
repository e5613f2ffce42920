package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 probe: does the executed plan of one ConnectedComponents
  * round REUSE the `stepped` aggregate that `jump` references twice, or
  * does each jump side recompute the whole join+union+agg? Prints the
  * post-AQE plan of a round materialization plus ReusedExchange,
  * Exchange, join-strategy and aggregate counts. */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-cc-plan-probe")
    import spark.implicits._
    val edges = (0L until 2000L).map(i => (i, i + 1)).toDF("src", "dst")
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
    // fused round 1, exactly as the operator
    val r1 = jump(sym.groupBy(col("dst"))
      .agg(least(col("dst"), min(col("src"))).as("lbl"))
      .select(col("dst").as("node"), col("lbl")))
      .localCheckpoint(false)
    r1.count()
    // round 2, exactly as the operator
    val nmin = sym.join(r1.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), col("lbl"))
    val stepped = r1.union(nmin).groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
    def report(tag: String, df: DataFrame): Unit = {
      df.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      def count(pat: String) = pat.r.findAllIn(plan).length
      println(s"PROBE $tag ReusedExchange=${count("ReusedExchange")} " +
        s"shuffleStages=${count("ShuffleQueryStage")} " +
        s"aggNode=${count("HashAggregate\\(keys=\\[node")} " +
        s"inMemScan=${count("InMemoryTableScan")} " +
        s"SMJ=${count("SortMergeJoin")} BHJ=${count("BroadcastHashJoin")}")
    }
    // UNCACHED round 2 (the pre-r13 operator shape): jump's self-join
    // computes `stepped` twice — two full shuffle stages of the same
    // join+union+aggregate
    report("uncached", jump(stepped))
    // CACHED round 2 (the operator's r13 shape): one materialization
    val steppedM = stepped.cache()
    report("cached  ", jump(steppedM))
    steppedM.unpersist()
    spark.stop()
  }
}
