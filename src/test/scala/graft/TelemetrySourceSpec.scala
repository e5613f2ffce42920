package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector contract: correct rows, source-level column
  * pruning, id-range filter pushdown that removes the Spark-side filter,
  * and planner-controlled partitioning. */
class TelemetrySourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def read(rows: Int = 10000, parts: Int = 8) =
    spark.read.format("graft.sources.TelemetrySource")
      .option("rows", rows).option("partitions", parts).load()

  test("full scan yields the declared rows across the declared partitions") {
    val df = read()
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.schema.fieldNames.toSeq == Seq("id", "sensor", "ts_epoch_s", "value"))
  }

  test("column pruning reaches the source (ReadSchema shrinks)") {
    val df = read().select("sensor", "value")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("TelemetryScan"))
    assert(!scan.contains("ts_epoch_s")) // pruned column never generated
    val n = df.groupBy("sensor").count().count()
    assert(n == 16)
  }

  test("id-range filters push into the source and shrink the scan range") {
    val df = read().filter(col("id") >= 9000 && col("id") < 9500)
    assert(df.count() == 500)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TelemetryScan[9000,9500)"))
    // values identical to the unpushed path
    val viaFull = read().collect().filter(r => r.getLong(0) >= 9000 && r.getLong(0) < 9500)
      .map(_.getDouble(3)).sum
    val viaPushed = df.agg(sum("value")).as[Double].head()
    assert(math.abs(viaFull - viaPushed) < 1e-6)
  }

  test("non-id filters are rejected back to Spark and still applied") {
    val df = read().filter(col("sensor") === "sensor_3" && col("id") < 160)
    // 10 ids in [0,160) have id % 16 == 3
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TelemetryScan[0,160)")) // id part pushed
    assert(plan.contains("Filter"))               // sensor part stays in Spark
  }

  test("contradictory pushed range yields an empty scan, not an error") {
    val df = read().filter(col("id") > 5000 && col("id") < 10)
    assert(df.count() == 0)
  }
}
