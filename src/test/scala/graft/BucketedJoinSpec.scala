package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story (SURVEY §2.3 scale notes): bucketing both
  * fact tables on the join key removes the orders⋈lineitem shuffle
  * entirely — the single biggest exchange in the star schema. This spec
  * proves the plan shape: bucketed join = zero Exchange operators;
  * unbucketed join = two. */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed tables join with no shuffle and identical results") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    // disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      t.lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
      t.orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")

      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      val unbucketed = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))

      def joinExchanges(df: org.apache.spark.sql.DataFrame): Int = {
        // count exchanges feeding the join (before the final groupBy agg)
        val plan = df.queryExecution.executedPlan.toString
        val joinIdx = plan.indexOf("SortMergeJoin")
        assert(joinIdx >= 0, s"expected SortMergeJoin in plan:\n$plan")
        "Exchange hashpartitioning".r.findAllIn(plan.substring(joinIdx)).length
      }
      assert(joinExchanges(bucketed) == 0)   // co-located: scan feeds join directly
      assert(joinExchanges(unbucketed) == 2) // both sides reshuffled

      val a = bucketed.orderBy("o_orderpriority").collect().toSeq
      val b = unbucketed.orderBy("o_orderpriority").collect().toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
