package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc plan inspector: `sbt "runMain graft.tools.PlanDump <query> <dir> [dir2 ...]"`
  * executes the query against each dir and prints the final (post-AQE)
  * physical plan — the fastest way to answer "what plan did this take at
  * THAT scale" when a scale-audit ratio looks surprising. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dirs = args.drop(1)
    val spark = GraftSession.local("graft-plandump")
    val fn = SparkEntry.queries(name)
    for (d <- dirs) {
      val df = fn(spark, d)
      df.collect()
      println(s"=== $name @ $d")
      println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
