package graft

import graft.ops.SkewedJoin
import org.apache.spark.sql.functions._

/** Salting changes distribution, never results: the salted join must
  * equal the plain join on a skewed dataset, and the hot key's rows must
  * actually scatter across salt buckets. */
class SkewedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals plain join on a 90%-hot-key dataset") {
    val probe = (1 to 10000).map(i => (if (i <= 9000) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload") // key 1 holds 90% of rows
    val build = Seq((1L, "hot"), (9500L, "cold"), (9999L, "tail")).toDF("bk", "label")

    val plain = probe.join(build, col("k") === col("bk"))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label").collect().toSeq
    val salted = SkewedJoin.saltedInnerJoin(probe, "k", build, "bk", 8)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label").collect().toSeq
    assert(salted == plain)
    assert(plain.map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("hot" -> 9000L, "cold" -> 1L, "tail" -> 1L))
  }

  test("the hot key scatters across multiple salt buckets") {
    val probe = (1 to 5000).map(i => (1L, i)).toDF("k", "v")
    val nBuckets = probe
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(nBuckets == 8) // all buckets used -> 8-way parallelism on the hot key
  }
}
