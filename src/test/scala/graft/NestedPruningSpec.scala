package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Nested-schema pruning: selecting one field of a struct column must
  * narrow the parquet ReadSchema to that leaf — at 100 TB a wide nested
  * envelope (the reference's ContainerOutput shape) is read back at leaf
  * granularity, not whole-struct.
  */
class NestedPruningSpec extends SparkSpecBase {

  test("struct leaf projection prunes the parquet ReadSchema to the leaf") {
    val dir = Files.createTempDirectory("nested").toString
    val t = Tables(spark, "/root/testdata/sf0.001")
    // envelope-shaped nested record: metadata struct + payload struct
    t.events.filter(col("event_id") < 2000)
      .select(col("event_id"),
        struct(col("user_id"), col("event_type"), col("ts")).as("meta"),
        struct(col("value"), col("props")).as("payload"))
      .write.mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
      .select(col("event_id"), col("meta.event_type").as("et"))
    val scan = df.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("event_type"), s"leaf missing from scan: $scan")
    assert(!scan.contains("user_id") && !scan.contains("payload"),
      s"scan reads unpruned nested fields: $scan")

    // and the values survive the pruned read
    val n = df.filter(col("et") === "click").count()
    val expected = t.events.filter(col("event_id") < 2000 && col("event_type") === "click").count()
    assert(n == expected)
  }
}
