package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 probe: per-step timing of the PRE-FUSION (r12-shaped)
  * ConnectedComponents loop, replicated inline, on the entity_resolution
  * edge set — the measurement that attributed the ~3.4 s warm cost to
  * per-AQE-stage-job driver latency (~8 stage-jobs/round, ~70 tiny tasks,
  * <0.5 s of summed executor time) rather than compute, and motivated
  * fusing round 1 into a direct aggregate over sym. The lazy
  * localCheckpoint timer ("plan+ckpt") is where the stages execute:
  * under AQE, .rdd forces getFinalPhysicalPlan which runs every upstream
  * shuffle stage eagerly.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-cc-probe")
    // job/stage/task accounting: how much of each round is scheduled work
    // vs driver-side latency
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    def counters(): String =
      s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskMs=${taskMs.get}"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val t = Tables(spark, sfDir)
    val recs = t.customer.select(col("c_custkey").cast("long").as("k"))
      .withColumn("nm", substring(md5(concat(lit("ent:"), col("k").cast("string"))), 1, 12))
      .select(explode(expr(
        "filter(array(" +
          "struct(k * 10 AS rec_id, nm AS name), " +
          "IF(k % 2 = 0, struct(k * 10 + 1 AS rec_id, " +
          "  concat(substring(nm, 1, 8), 'zz', substring(nm, 11, 2)) AS name), NULL), " +
          "IF(k % 4 = 0, struct(k * 10 + 2 AS rec_id, " +
          "  concat(substring(nm, 1, 10), 'qq') AS name), NULL)" +
          "), r -> r IS NOT NULL)")).as("r"))
      .select(col("r.rec_id").as("rec_id"), col("r.name").as("name"))
      .withColumn("blk", substring(col("name"), 1, 6))
      .localCheckpoint()
    val edges = recs.groupBy(col("blk"))
      .agg(collect_list(struct(col("rec_id"), col("name"))).as("rs"))
      .select(explode(expr(
        "flatten(transform(rs, (x, i) -> " +
          "transform(filter(slice(rs, i + 2, size(rs)), " +
          "            y -> levenshtein(x.name, y.name) <= 2), " +
          "  y -> struct(least(x.rec_id, y.rec_id) AS src, " +
          "              greatest(x.rec_id, y.rec_id) AS dst))))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val sym = edges
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("src"))
        .cache()
      def jump(df: DataFrame): DataFrame = {
        val j = df.select(col("node").as("jnode"), col("lbl").as("jlbl"))
        df.join(j, col("lbl") === col("jnode"), "left")
          .select(col("node"), coalesce(col("jlbl"), col("lbl")).as("lbl"))
      }
      val nodes = sym.select(col("src").as("node")).distinct()
      var lbl = timed("init: nodes+ckpt(lazy)") {
        nodes.select(col("node"), col("node").as("lbl")).localCheckpoint(false)
      }
      var prevSum: Option[BigDecimal] = None
      for (round <- 1 to 3) {
        val nmin = sym.join(lbl.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("lbl"))
        val stepped = lbl.union(nmin).groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        lbl = timed(s"round $round: plan+ckpt(lazy)") { jump(stepped).localCheckpoint(false) }
        val s = timed(s"round $round: sum action") {
          Option(lbl.agg(sum(col("lbl")).cast("decimal(38,0)")).head().getDecimal(0))
            .map(BigDecimal(_))
        }
        println(s"PROBE round $round converged=${prevSum == s} ${counters()}")
        prevSum = s
      }
      sym.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
