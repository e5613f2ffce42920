package graft.tools

import graft.{GraftSession, SparkEntry}

/** Round-12 plan evidence writer: for each named query, executes it at
  * the given sf and writes `df.explain("formatted")` output (the
  * pre-execution plan with pushdown/join/exchange detail) plus the
  * post-AQE executed plan to `<outDir>/<name>_<tag>.txt` — the
  * before/after artifacts the optimization round commits under
  * plans/r12/.
  *
  * Usage: sbt "runMain graft.tools.PlanFiles <tag> <outDir> <q1,q2,...> [sfDir]"
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-planfiles")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"=== $name @ $sfDir ($tag)\n\n--- explain(formatted) ---\n" +
        formatted + "\n--- executed plan (post-AQE) ---\n" + executed + "\n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      spark.catalog.clearCache()
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
