// lives in graft.queries for access to the private[queries] pair
// builder it probes; kept under tools/ with the other round-13 probes
package graft.queries

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-13 stage-attribution probe for e2e_llm_pipeline: times each
  * funnel stage in isolation (noop sink / count), twice, so the record
  * shows whether the seconds go to the regex quality cascade, the exact
  * dedup, the LSH pair graph, the components, or the final censuses.
  * Mirrors E2EQueries.llmPipeline stage-for-stage.
  */
object LlmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-llm-probe")
    def timed[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val t = Tables(spark, sfDir)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val docs = graft.ops.ScanLayout.widenByKey(t.documents, col("doc_id"))
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("mean_word_len",
          (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
        .withColumn("symbol_ratio",
          size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast("double") / col("n_chars"))
        .withColumn("has_stopword",
          arrays_overlap(split(col("text"), " "),
            array(lit("the"), lit("a"), lit("and"), lit("of"))))
      val quality = docs.filter(
        col("n_chars").between(100, 20000) && col("mean_word_len").between(3, 10) &&
          col("symbol_ratio") < 0.1 && col("has_stopword"))
        .select("doc_id", "source", "text").cache()
      timed("quality cascade (count)") { quality.count() }

      val withFp = quality.withColumn("fp", md5(col("text")))
      val keepIds = withFp.groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val exact = withFp.join(keepIds, Seq("doc_id"), "left_semi").drop("fp").cache()
      timed("exact dedup (count)") { exact.count() }

      val pairs = DedupQueries.verifiedPairsOver(exact)
        .select(col("i").as("src"), col("j").as("dst"))
      timed("LSH pairs (noop)") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      val losers = timed("cc resolve") {
        graft.ops.ConnectedComponents.resolve(pairs)
          .filter(col("node") =!= col("lbl"))
          .select(col("node").as("doc_id"))
      }
      val fin = exact.join(losers, Seq("doc_id"), "left_anti")
      timed("final censuses (noop)") {
        t.documents.groupBy("source").agg(count(lit(1)).as("n_input"))
          .join(quality.groupBy("source").agg(count(lit(1)).as("n_quality")), Seq("source"), "left")
          .join(exact.groupBy("source").agg(count(lit(1)).as("n_exact")), Seq("source"), "left")
          .join(fin.groupBy("source").agg(count(lit(1)).as("n_final"),
            sum(size(expr("regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\\\s]', 0)")))
              .as("total_subword_tokens"),
            sum(when(length(col("text")) > 0,
              ceil(length(col("text")) / 64.0).cast("long")).otherwise(0L)).as("n_chunks")),
            Seq("source"), "left")
          .na.fill(0)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
