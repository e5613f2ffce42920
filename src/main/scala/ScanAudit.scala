object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("scanaudit")
    val names = Seq("e2e_contrastive_pairs", "a10_dedup_clusters", "q3_join_topk",
      "e2e_llm_pipeline", "a10_jaccard_ngram", "q4_exists_semi", "q21_waiting_supplier",
      "j8_cooccurrence", "w6_robust_outliers", "t6_event_collect")
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        val scans = "FileScan parquet".r.findAllIn(plan).size
        val mem = "InMemoryRelation".r.findAllIn(plan).size
        println(s"AUDIT $n scans=$scans inmem=$mem")
      } catch { case e: Exception => println(s"AUDIT $n ERR ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
