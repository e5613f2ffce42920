package graft.ops

/** Debug dump of [[CollectFull.run]] for oracle authoring:
  * `sbt "runMain graft.ops.DumpCollect /tmp/collect_full"`. */
object DumpCollect {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/collect_full")
    val spark = graft.GraftSession.local("dump-collect")
    val df = CollectFull.run(spark)
    df.printSchema()
    df.coalesce(1).write.mode("overwrite").parquet(out)
    println(s"wrote $out")
    spark.stop()
  }
}
