package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S9 sink depth: hive-style partitioned parquet layout with bounded
  * file sizes — the write shape a 100 TB pipeline emits (partition
  * pruning on read; maxRecordsPerFile bounds task output skew). */
class PartitionedSinkSpec extends SparkSpecBase {

  test("partitionBy layout prunes on read and respects maxRecordsPerFile") {
    val out = Files.createTempDirectory("sink").toString
    val events = Tables(spark, "/root/testdata/sf0.001").events
    events.write
      .partitionBy("event_type")
      .option("maxRecordsPerFile", 100)
      .mode("overwrite").parquet(out)

    // hive-style dirs exist per type
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("event_type=")))
    assert(dirs.length == 5)

    // file-size bound honored
    val clickFiles = new java.io.File(s"$out/event_type=click").listFiles
      .filter(_.getName.endsWith(".parquet"))
    val clickRows = spark.read.parquet(s"$out/event_type=click").count()
    assert(clickFiles.length >= (clickRows / 100.0).ceil.toInt)

    // a filter on the partition column becomes partition pruning, not a data read
    val pruned = spark.read.parquet(out).filter(col("event_type") === "click")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(400))
    assert(pruned.count() == events.filter(col("event_type") === "click").count())
  }
}
