package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Micro-benchmark for the rank-filter → TopKPerKey rewrite's crossover:
  * the same top-3-per-key question at a FIXED 10M-row corpus under
  * sweeping group sizes (many small groups → few huge groups), timed
  * with the rewrite off (WindowExec: exchange + per-partition codegen'd
  * sort) and on (TopKPerKeyExec: partial+final bounded heaps). Run:
  *
  *   sbt "runMain graft.TopKBench"
  *
  * Prints one JSON line per group-size point. This is the measurement
  * behind the rule's default: codegen'd sort wins small groups on
  * constant factors; the heap wins once per-key row counts grow past
  * the crossover, where sort work is n·log n against the heap's n·log k
  * and the shuffle carries partition×keys×k rows instead of all n.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-topkbench")
    import spark.implicits._
    val n = 10000000L
    val results = Seq.newBuilder[String]
    for (keys <- Seq(1000000, 10000, 100, 4)) {
      // deterministic synthetic corpus: id, key = id % keys, value hashed
      val df = spark.range(n)
        .select(col("id"), (col("id") % keys).as("k"),
          expr("xxhash64(id)").as("v"))
        .cache()
      df.count() // materialize once, outside both timers
      def run(): Long = {
        val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .drop("rn").count()
      }
      def time(flag: Boolean): Double = {
        spark.conf.set("spark.graft.topk.rewrite", flag.toString)
        try { run(); (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }.min }
        finally spark.conf.unset("spark.graft.topk.rewrite")
      }
      val sortS = time(false)
      val heapS = time(true)
      results += f"""{"rows_per_key":${n / keys},"keys":$keys,"window_sort_s":$sortS%.3f,"topk_heap_s":$heapS%.3f,"speedup":${sortS / heapS}%.2f}"""
      df.unpersist()
    }
    println(results.result().mkString("[", ",", "]"))
    spark.stop()
  }
}
