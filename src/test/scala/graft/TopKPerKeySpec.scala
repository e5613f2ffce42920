package graft

import graft.ops.TopK
import org.apache.spark.sql.functions._

/** Custom per-key top-k physical operator: result equivalence with the
  * window row_number form, plan shape (custom exec present, no sort),
  * and the clustered-distribution requirement. */
class TopKPerKeySpec extends SparkSpecBase {

  private def events = Tables(spark, "/root/testdata/sf0.001").events

  test("matches the window row_number formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val ours = TopK.perKey(events, Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc), 3)
      .select("user_id", "event_id")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val window = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("user_id", "event_id")
    assert(ours.count() == window.count())
    assert(ours.exceptAll(window).count() == 0)
    assert(window.exceptAll(ours).count() == 0)
  }

  test("plans partial + final execs around the hash exchange, WITHOUT any sort") {
    val df = TopK.perKey(events, Seq("user_id"), Seq(col("value").desc), 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), s"map-side partial missing:\n${p.take(1500)}")
    assert(p.contains("TopKPerKeyFinal"), s"final exec missing:\n${p.take(1500)}")
    assert(p.contains("Exchange hashpartitioning(user_id"),
      s"keys not clustered:\n${p.take(1500)}")
    // partial must be BELOW the exchange (map-side), final above
    val idxPartial = p.indexOf("TopKPerKeyPartial")
    val idxExchange = p.indexOf("Exchange hashpartitioning")
    val idxFinal = p.indexOf("TopKPerKeyFinal")
    assert(idxFinal < idxExchange && idxExchange < idxPartial,
      s"pass ordering wrong (final→exchange→partial expected top-down):\n${p.take(1500)}")
    assert(!p.contains("Sort "), s"a sort crept in — the operator's whole point:\n${p.take(1500)}")
  }

  test("empty keys computes GLOBAL top-k (AllTuples distribution), not per-partition") {
    val global = TopK.perKey(events, Seq.empty, Seq(col("value").desc, col("event_id").asc), 5)
      .select("event_id")
    val expected = events.orderBy(col("value").desc, col("event_id").asc)
      .limit(5).select("event_id")
    assert(global.count() == 5)
    assert(global.exceptAll(expected).count() == 0)
  }

  test("partial-pass key cap: overflow passes through unpruned, result unchanged") {
    import org.apache.spark.sql.expressions.Window
    // cap far below the distinct user_id count so most rows overflow the
    // map-side state and are forwarded raw to the final pass
    spark.conf.set("spark.graft.topk.maxPartialKeys", "4")
    try {
      val ours = TopK.perKey(events, Seq("user_id"),
        Seq(col("value").desc, col("event_id").asc), 3)
        .select("user_id", "event_id")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      val window = events.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("user_id", "event_id")
      assert(ours.exceptAll(window).count() == 0)
      assert(window.exceptAll(ours).count() == 0)
    } finally {
      spark.conf.unset("spark.graft.topk.maxPartialKeys")
    }
  }

  test("final pass is correct when key count far exceeds the partial cap (high-cardinality stress)") {
    // 50k distinct keys, 4 rows each, against a 16-key map-side cap: the
    // partial pass passes nearly everything through raw, so the FINAL pass
    // builds one heap per key of its partition — the memory-contract case
    // the scaladoc documents (state = O(output): keys×k retained rows).
    spark.conf.set("spark.graft.topk.maxPartialKeys", "16")
    try {
      val n = 200000L
      val df = spark.range(n).select(
        (col("id") % 50000).as("k"),
        (col("id") * 2654435761L % 1000003).as("v"))
      val top = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("k").asc), 2)
      // every key retains min(4, 2) rows → exactly 100k output rows
      assert(top.count() == 100000L)
      // spot-check one key against a direct sort
      val k0 = top.filter(col("k") === 123).orderBy(col("v").desc).collect().map(_.getLong(1))
      val expect = df.filter(col("k") === 123).orderBy(col("v").desc).limit(2)
        .collect().map(_.getLong(1))
      assert(k0.sameElements(expect), s"key 123: got ${k0.toSeq}, want ${expect.toSeq}")
    } finally {
      spark.conf.unset("spark.graft.topk.maxPartialKeys")
    }
  }

  test("k larger than any group degenerates to the identity") {
    val all = TopK.perKey(events.filter(col("user_id") < 5), Seq("user_id"),
      Seq(col("value").desc), 1000000)
    assert(all.count() == events.filter(col("user_id") < 5).count())
  }
}
