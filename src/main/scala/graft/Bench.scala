package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. One untimed warm-up pass amortizes scan/codegen
  * startup, then each query reports min-of-3 (steady-state, the number a
  * cluster would see per stage after JIT). Failures are surfaced per-query
  * in an "errors" map instead of being folded into a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Self-labeling run conditions (VERDICT r8 next #9): this box's
    // timings drift ±10-60% under concurrent load, so the record carries
    // the 1-minute loadavg at start AND end — a noisy record announces
    // itself instead of silently becoming the committed baseline.
    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg
    val spark = GraftSession.local("graft-bench")

    // optional comma-separated name filter for local per-query iteration
    // (the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // a misspelled name would otherwise be silently filtered to an
    // empty (exit-0) run — warn loudly so local iteration isn't misled
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(
          s"WARNING: SPARK_GRAFT_ONLY names match no registered query: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        errors.getOrElseUpdate(name, Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        None
      }
    }

    // warm-up (untimed): populates FS caches, triggers codegen/JIT.
    // Query-local .cache() blocks are dropped after each query — 134
    // queries' pinned blocks would otherwise accumulate for the whole
    // session (run 1 of the timed 3 rebuilds its own cache; min-of-3
    // still reports the steady-state number).
    qs.foreach { case (n, f) => once(n, f); spark.catalog.clearCache() }

    val timings = qs.flatMap { case (n, f) =>
      if (errors.contains(n)) None
      else {
        val runs = (1 to 3).flatMap(_ => once(n, f))
        spark.catalog.clearCache()
        if (runs.isEmpty) None else Some(n -> runs.min)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val qJson = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val eJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"errors":$eJson,"n_err":${errors.size},"sf":${jstr(sfDir)},"loadavg_start":$loadStart,"loadavg_end":$loadavg}"""
    println(line)
    // The driver captures stdout with a tail cut that can truncate the
    // per-query map mid-dict; persist the full line so every query stays
    // machine-diffable (tools/bench_diff.py reads this file too).
    // Filtered local runs (SPARK_GRAFT_ONLY) must NOT clobber the full
    // suite file with a subset.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/bench_out.json"), line + "\n")
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
