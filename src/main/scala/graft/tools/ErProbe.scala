package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-13 stage-attribution probe for a10_entity_resolution (VERDICT
  * r12 next #3 asks for measured stage attribution before touching it).
  * Times each pipeline stage in isolation with the noop sink, twice
  * (cold + warm), so the record shows where the seconds actually go:
  * record derivation, blocking fold + levenshtein gate, connected
  * components, final census.
  *
  * Usage: sbt "runMain graft.tools.ErProbe [sfDir]"
  */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-er-probe")
    def timed[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val t = Tables(spark, sfDir)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val recs = timed("recs: derive+checkpoint") {
        t.customer.select(col("c_custkey").cast("long").as("k"))
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
      }
      val edges = recs.groupBy(col("blk"))
        .agg(collect_list(struct(col("rec_id"), col("name"))).as("rs"))
        .select(explode(expr(
          "flatten(transform(rs, (x, i) -> " +
            "transform(filter(slice(rs, i + 2, size(rs)), " +
            "            y -> levenshtein(x.name, y.name) <= 2), " +
            "  y -> struct(least(x.rec_id, y.rec_id) AS src, " +
            "              greatest(x.rec_id, y.rec_id) AS dst))))")).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      timed("edges: fold+gate (noop)") {
        edges.write.format("noop").mode("overwrite").save()
      }
      val labels = timed("cc: resolve (ckpt rounds)") {
        val r = graft.ops.ConnectedComponents.resolveChecked(edges)
        println(s"PROBE cc rounds=${r.rounds} converged=${r.converged}")
        r.labels
      }
      timed("census: join+agg (noop)") {
        recs.select(col("rec_id").as("node"))
          .join(labels, Seq("node"), "left")
          .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
          .groupBy(col("lbl"))
          .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_member"))
          .groupBy(col("n_members"))
          .agg(count(lit(1)).as("n_clusters"), sum(col("min_member")).as("rep_sum"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
