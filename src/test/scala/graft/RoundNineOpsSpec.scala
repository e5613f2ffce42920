package graft

import graft.queries.{AggQueries, DedupQueries, GraphQueries, MonitorQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Construction invariants of the round-9 operators (KS drift, group
  * parity, Count-Min, label propagation, containment, RAKE keyphrases)
  * beyond what the DuckDB oracle pins — properties that must hold by the
  * math, checked on the sf0.001 fixture. */
class RoundNineOpsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("KS statistic: bounded in [0, 1e6] and zero for identical populations") {
    val row = MonitorQueries.ksStat.fn(spark, dir).collect().head
    val d = row.getAs[Long]("d_ppm")
    assert(d >= 0L && d <= 1000000L)
    assert(row.getAs[Long]("na") + row.getAs[Long]("nb") ==
      spark.read.parquet(s"$dir/events.parquet").count())

    // a population compared against itself has identical integer CDFs:
    // D must be exactly 0 at every cents value
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val census = t.events
      .select(expr("cast(round(value * 100) as long)").as("cents"))
      .groupBy("cents").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = census.agg(sum("c").as("n"))
    val selfD = census.select(col("cents"), sum("c").over(w).as("f"))
      .crossJoin(broadcast(tot))
      .select(expr("abs((f * 1000000L) div n - (f * 1000000L) div n)").as("d"))
      .agg(max("d")).collect().head.getLong(0)
    assert(selfD == 0L)
  }

  test("group parity: census covers every document and the best source scores exactly 1e6") {
    val out = MonitorQueries.groupParity.fn(spark, dir).cache()
    try {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      assert(out.agg(sum("n")).collect().head.getLong(0) == nDocs)
      // di_vs_best is (rate*1e6) div best: the argmax group hits exactly 1e6
      assert(out.agg(max("di_vs_best_ppm")).collect().head.getLong(0) == 1000000L)
      // rates are valid ppm
      assert(out.filter(col("rate_ppm") < 0 || col("rate_ppm") > 1000000).count() == 0)
    } finally out.unpersist()
  }

  test("count-min sketch: one-sided for EVERY user, not just the top-10") {
    val t = Tables(spark, dir)
    val A = Seq(999983L, 999979L, 999961L, 999959L)
    val B = Seq(17L, 257L, 4099L, 65537L)
    def bucket(j: Int) =
      expr(s"(((user_id % 1000003L) * ${A(j)}L + ${B(j)}L) % 1000003L) % 64L")
    val ev = t.events.select(col("user_id"))
    val sketch = ev.select(col("user_id"),
      explode(array((0 until 4).map(j =>
        struct(lit(j.toLong).as("j"), bucket(j).as("b"))): _*)).as("h"))
      .select(col("h.j"), col("h.b"))
      .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    val est = exact.select(col("user_id"), col("exact_n"),
      explode(array((0 until 4).map(j =>
        struct(lit(j.toLong).as("j"), bucket(j).as("b"))): _*)).as("h"))
      .select(col("user_id"), col("exact_n"), col("h.j"), col("h.b"))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy("user_id", "exact_n").agg(min("cnt").as("est"))
    assert(est.filter(col("est") < col("exact_n")).count() == 0)

    // and the registered top-10 face certifies the same
    val out = AggQueries.countMin.fn(spark, dir)
    assert(out.filter(!col("one_sided_ok") || !col("within_eps")).count() == 0)
  }

  test("label propagation: labels partition the node set and refine connected components") {
    val out = GraphQueries.labelPropagation.fn(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every community is keyed by an actual node id and min_node <= community
    // is not required (a label can migrate), but sizes are positive
    assert(rows.forall(_.getAs[Long]("sz") > 0))

    // rebuild the full label table (the query census truncates to 20) and
    // check: same-community nodes are connected in the underlying graph —
    // LPA labels can only flow along edges, so each community must sit
    // inside ONE connected component.
    val t = Tables(spark, dir)
    val items = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val keep = items.groupBy("o").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 6)).select("o")
    val kept = items.join(keep, "o")
    val edges = kept.select(col("o"), col("p").as("src"))
      .join(kept.select(col("o"), col("p").as("dst")), Seq("o"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val cc = graft.ops.ConnectedComponents.resolve(edges)
      .select(col("node"), col("lbl").as("component"))
    // ConnectedComponents.resolve: (node, lbl = min node of component).
    // A community whose nodes span >1 component would be a propagation bug.
    import org.apache.spark.sql.expressions.Window
    val lblTbl = {
      var lbl = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      val byFreq = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("lbl").asc)
      for (_ <- 1 to 3) {
        lbl = edges.join(lbl.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(byFreq))
          .filter(col("rn") === 1).select("node", "lbl")
          .localCheckpoint()
      }
      lbl
    }
    val spans = lblTbl.join(cc, "node")
      .groupBy("lbl").agg(countDistinct("component").as("n_comp"))
    assert(spans.filter(col("n_comp") > 1).count() == 0)
  }

  test("containment is direction-aware but shares a symmetric numerator") {
    val t = Tables(spark, dir)
    val grams = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 4)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("w")) - 3),
          i => concat_ws(" ", (0 to 3).map(k => element_at(col("w"), i + k)): _*))))
          .as("g"))
    val disc = grams.groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, 16)).select("g")
    val kept = grams.join(disc, "g").localCheckpoint()
    val shared = kept.select(col("g"), col("doc_id").as("a"))
      .join(kept.select(col("g"), col("doc_id").as("b")), "g")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s"))
    // shared(a,b) == shared(b,a): the numerator is symmetric even though
    // the containment ratio is not
    val asym = shared.as("x").join(
      shared.select(col("a").as("b"), col("b").as("a"), col("s").as("s2")), Seq("a", "b"))
      .filter(col("s") =!= col("s2"))
    assert(asym.count() == 0)

    val out = DedupQueries.containment.fn(spark, dir)
    assert(out.filter(col("containment_ppm") > 1000000L || col("na") < 5L).count() == 0)
  }

  test("HITS: scores are normalized millionths with both maxima hit exactly") {
    val out = GraphQueries.hits.fn(spark, dir).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("hub_e6") < 0 || col("hub_e6") > 1000000L ||
        col("auth_e6") < 0 || col("auth_e6") > 1000000L).count() == 0)
      // each half-step renormalizes to millionths of the max, so the
      // best hub and best authority score exactly 1e6
      assert(out.agg(max("hub_e6")).collect().head.getLong(0) == 1000000L)
      assert(out.agg(max("auth_e6")).collect().head.getLong(0) == 1000000L)
      // the oriented graph must differentiate the two roles somewhere
      assert(out.filter(col("hub_e6") =!= col("auth_e6")).count() > 0)
    } finally out.unpersist()
  }

  test("Theil-Sen: quartiles bracket the median and the pair count is C(buckets,2)") {
    val row = MonitorQueries.theilSen.fn(spark, dir).collect().head
    val (m, med, p25, p75) = (row.getAs[Long]("n_pairs"),
      row.getAs[Long]("median_slope_e6"),
      row.getAs[Long]("p25_slope_e6"), row.getAs[Long]("p75_slope_e6"))
    assert(p25 <= med && med <= p75)
    val buckets = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 1800000000").as("x")).distinct().count()
    assert(m == buckets * (buckets - 1) / 2)
  }

  test("vocab concentration: shares and HHI stay in their per-mille/ppm ranges") {
    val out = TextQueries.vocabConcentration.fn(spark, dir).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("top_share_pm") > 1000 || col("top_share_pm") < 0).count() == 0)
      assert(out.filter(col("hhi_ppm") > 1000000L || col("hhi_ppm") < 0).count() == 0)
      // the top word's squared share alone is a lower bound on the HHI
      assert(out.filter(col("hhi_ppm") < col("top_share_pm") * col("top_share_pm")).count() == 0)
    } finally out.unpersist()
  }

  test("deletion vectors: live + deleted partitions the estate; deletes match the build rule") {
    import graft.queries.SourceQueries
    val out = SourceQueries.deletionVectors.fn(spark, dir).cache()
    try {
      // the query pins the sf0.01 estate regardless of dir (static oracle)
      val raw = Tables(spark, "/root/testdata/sf0.01").events
      val perType = raw.groupBy("event_type").agg(
        count(lit(1)).as("n_all"),
        count(when(col("event_id") % 97 === 0, 1)).as("n_rule"))
      val joined = out.join(perType, "event_type")
      assert(joined.filter(col("n_live") + col("n_deleted") =!= col("n_all")).count() == 0,
        "MOR read must partition every row into live xor deleted")
      assert(joined.filter(col("n_deleted") =!= col("n_rule")).count() == 0,
        "positional deletes must equal the content rule the DV was built from")
    } finally out.unpersist()
  }

  test("autocorrelation: r bounded by ±1e6 and every requested lag reports") {
    val out = MonitorQueries.autocorrelation.fn(spark, dir).collect()
    assert(out.map(_.getAs[Long]("lag")).sorted.sameElements(
      Array(1L, 2L, 4L, 8L, 12L, 24L, 48L)))
    assert(out.forall(r => math.abs(r.getAs[Long]("r_ppm")) <= 1000000L))
    assert(out.forall(_.getAs[Long]("n_pairs") > 0))
  }

  test("RAKE keyphrases: no stopwords inside phrases, lengths within the cap") {
    val out = TextQueries.keyphrases.fn(spark, dir).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("len") < 1 || col("len") > 4).count() == 0)
      val withStop = out.filter(
        array_contains(split(col("phrase"), " "), "the") ||
          array_contains(split(col("phrase"), " "), "a"))
      assert(withStop.count() == 0)
      // phrase length matches its token count
      assert(out.filter(size(split(col("phrase"), " ")) =!= col("len")).count() == 0)
    } finally out.unpersist()
  }
}
