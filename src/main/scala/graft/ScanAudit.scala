package graft

/** Recompute diagnostic: prints the number of `FileScan parquet`
  * occurrences (and InMemoryRelation markers) in each query's executed
  * plan. A high scan count with no caching usually means a subtree is
  * consumed by several downstream branches and Spark is re-running its
  * whole lineage per consumer — the pattern behind this round's
  * x28_bigram_lm (10 scans), w6_robust_outliers, and j8_cooccurrence
  * fixes. Scans INSIDE an InMemoryRelation block are the cached plan's
  * lineage printout, not re-executions.
  *
  * Usage: sbt "runMain graft.ScanAudit [sfDir] [name1,name2,...]"
  * (default: every registered query, worst offenders first)
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').toSet) else None
    val spark = GraftSession.local("graft-scanaudit")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (n, fn) =>
        val out = try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val scans = "FileScan parquet".r.findAllIn(plan).size
          val mem = "InMemoryRelation".r.findAllIn(plan).size
          Some((n, scans, mem))
        } catch {
          case e: Exception =>
            System.err.println(s"[scanaudit] $n failed: ${e.getMessage}")
            None
        }
        spark.catalog.clearCache()
        out
      }
    rows.sortBy { case (_, scans, mem) => -(scans - mem) }.foreach {
      case (n, scans, mem) => println(f"AUDIT $n%-28s scans=$scans%-3d inmem=$mem%-3d")
    }
    spark.stop()
  }
}
