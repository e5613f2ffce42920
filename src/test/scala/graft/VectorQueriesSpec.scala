package graft

import graft.queries.{QueryRegistry, VectorQueries}
import org.apache.spark.sql.functions._

/** Semantics of the vector-index training/compression operators
  * (VectorQueries) beyond the DuckDB oracle: invariants that must hold by
  * construction of the math, checked on the sf0.001 fixture. */
class VectorQueriesSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans iteration: every vector lands in exactly one cluster and " +
    "seed vectors assign to themselves") {
    val out = VectorQueries.kmeansIter.fn(spark, dir).cache()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nVecs = emb.count()

      // each of the 64 dims partitions the full corpus: membership sums
      // to the corpus size on every dim
      val perDim = out.groupBy("dim").agg(sum("n_members").as("total"))
        .select("total").distinct().collect()
      assert(perDim.length == 1 && perDim.head.getLong(0) == nVecs)

      // a seed centroid has distance 0 to itself, so cluster c must be
      // non-empty for every c in 0..7 (its own seed vector at minimum)
      val cids = out.select("c_id").distinct().collect().map(_.getLong(0)).sorted
      assert(cids.sameElements(0L until 8L))
    } finally out.unpersist()
  }

  test("sq8 quantization: codes stay in [0,255] and per-vector error is " +
    "within the half-cell bound") {
    val out = QueryRegistry.queries("j5_sq8_quantize")(spark, dir)
    val rows = out.collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(rows.length == emb.count())

    // max spread across dims in micro units bounds the per-element
    // midpoint error (err510 <= den), so total <= 64 * max(den)
    val spread = emb
      .select(posexplode(transform(col("embedding"),
        x => floor(x.cast("double") * 1000000L).cast("long"))).as(Seq("dim", "x")))
      .groupBy("dim").agg((max("x") - min("x")).as("den"))
      .agg(max("den")).collect().head.getLong(0)
    for (r <- rows) {
      val total = r.getAs[Long]("total_err_510")
      val codeSum = r.getAs[Long]("code_sum")
      assert(total >= 0 && total <= 64L * spread)
      assert(codeSum >= 0 && codeSum <= 255L * 64)
      assert(r.getAs[Long]("n_floor") + r.getAs[Long]("n_ceil") <= 64)
    }
    // the grid is tight: some element touches each end of some dim
    assert(rows.map(_.getAs[Long]("n_floor")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_ceil")).sum > 0)
  }

  test("pq adc: top-3 per probe query with exact non-negative distances " +
    "in rank order") {
    val rows = QueryRegistry.queries("j5_pq_adc")(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10) // probe set 450..459
    for ((q, rs) <- byQ) {
      assert(rs.length == 3, s"query $q returned ${rs.length} rows")
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(Array(1, 2, 3)))
      val dists = sorted.map(_.getAs[Long]("adc_dist"))
      assert(dists.forall(_ >= 0) && (dists, dists.tail).zipped.forall(_ <= _),
        s"query $q ADC distances not ascending: ${dists.mkString(",")}")
      assert(rs.forall(_.getAs[Long]("vec_id") != q))
    }
  }

  test("pii scrub: redaction leaves zero residual detections and only " +
    "planted docs count") {
    val out = QueryRegistry.queries("x28_pii_scrub")(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Int]("residual_max") == 0,
        s"source=${r.getAs[String]("source")} still has detectable PII after redaction")
      // redaction only ever removes planted chars (tokens are shorter
      // than what they replace), so the census must have found PII
      assert(r.getAs[Long]("docs_with_pii") > 0)
    }
  }
}
