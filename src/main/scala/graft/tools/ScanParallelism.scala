package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Measures the scan parallelism of each fixture table (the round-12
  * question: the driver fixtures are single-row-group parquet files, so
  * how many tasks can a scan stage actually run?), plus an A/B of a
  * heavy row-local pipeline with and without a post-scan repartition.
  *
  * Usage: sbt "runMain graft.tools.ScanParallelism [sfDir]"
  */
object ScanParallelism {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-scanpar")
    val t = Tables(spark, sfDir)
    for (name <- Seq("lineitem", "events", "documents", "embeddings", "orders")) {
      val df = t.table(name)
      println(s"$name: scan partitions = ${df.rdd.getNumPartitions}")
    }
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val heavy = (d: org.apache.spark.sql.DataFrame) => d
      .withColumn("sub", size(expr(
        "regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\\\s]', 0)")))
      .groupBy(col("source")).agg(sum(col("sub")).as("s"))
    // warm FS cache
    heavy(t.documents).write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      time("regex census, scan-partitioned") {
        heavy(t.documents).write.format("noop").mode("overwrite").save()
      }
      time("regex census, repartition(32) after read") {
        heavy(t.documents.repartition(32)).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
