package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Runtime re-planning demos at fixture scale: the two AQE/runtime-filter
  * behaviors the engine leans on at 100 TB, forced to trigger locally by
  * shrinking the relevant thresholds — proving the session config
  * actually produces them, not just that the flags are set.
  */
class AdaptiveExecSpec extends SparkSpecBase {
  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // drive THIS DataFrame's QueryExecution (a write/count would build a
    // fresh one and leave this AQE plan unfinalized)
    val it = df.toLocalIterator(); while (it.hasNext) it.next()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    // one hot key holding ~90% of rows — the classic power-law key. With
    // the advisory size shrunk, AQE must mark and split the skewed side.
    val old = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join

      // 90% of rows land on one key → its shuffle partition dwarfs the
      // median partition by ~30x, well past factor 2 + 16KB threshold
      val left = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("pay"))
      // exactly one row matches the hot key → output stays small while the
      // left's hot shuffle partition is still far over the skew threshold
      val right = spark.range(50000)
        .select(when(col("id") === 0, lit(7L)).otherwise(col("id") + 1000000L).as("k"),
          col("id").as("v"))
      val joined = left.join(right, "k")
      val p = finalPlan(joined)
      assert(p.contains("skew=true"), s"AQE did not mark the skewed join:\n${p.take(2000)}")
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("runtime Bloom-filter join pruning injects a bloom filter on the large side") {
    val old = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled").getOrElse("true"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold").getOrElse("10MB"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold").getOrElse("10GB"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // the 10GB default is sized for real clusters; at fixture scale the
      // probe side is tiny, so drop the floor to demonstrate the rewrite
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join → bloom eligible
      // parquet scans (runtime filters only apply to scans with stats);
      // selective dimension side → filter worth creating
      val t = Tables(spark, "/root/testdata/sf0.01")
      val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n${optimized.take(2000)}")
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
