package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("j5_kmeans_iter", "j5_pq_adc", "x28_bm25", "e2e_hybrid_search",
        "j8_cooccurrence", "s9_zorder_layout", "a10_incremental", "w4_gap_fill")) {
      val p = queries.QueryRegistry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val bc = "BroadcastExchange".r.findAllIn(p).length
      println(s"$n: hashEx=$ex broadcast=$bc takeOrdered=${p.contains("TakeOrderedAndProject")} " +
        s"bhj=${p.contains("BroadcastHashJoin")} nlj=${p.contains("BroadcastNestedLoopJoin")} " +
        s"partial=${p.contains("partial_")} wgl=${p.contains("WindowGroupLimit")}")
    }
    spark.stop()
  }
}
