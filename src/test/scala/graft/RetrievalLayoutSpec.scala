package graft

import graft.queries.QueryRegistry

/** Semantics of the round-5 retrieval/layout/time-series operators beyond
  * their DuckDB oracles: the structural claims each query's doc makes,
  * checked on the sf0.001 fixture. */
class RetrievalLayoutSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("bm25: 20 unique ranks and every hit contains a query term") {
    val rows = QueryRegistry.queries("x28_bm25")(spark, dir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 20))
    for (r <- rows)
      assert(r.getAs[Long]("tf_spark") + r.getAs[Long]("tf_join") +
        r.getAs[Long]("tf_stream") > 0)
  }

  test("count-min sketch never underestimates and is actually stressed") {
    val rows = QueryRegistry.queries("x28_heavy_hitters")(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("overcount") >= 0))
    // 16 buckets vs a ~50-word vocabulary must collide somewhere —
    // otherwise the sketch demo is vacuous
    assert(rows.exists(_.getAs[Long]("overcount") > 0))
  }

  test("z-order layout prunes the user point query better than the " +
    "linear layout") {
    val rows = QueryRegistry.queries("s9_zorder_layout")(spark, dir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("files_user_q"))).toMap
    // file counts are bounded by the 32 fixed buckets but nothing
    // guarantees every bucket is populated — only the pruning
    // INEQUALITY is a property of the layouts, not of the fixture
    assert(rows("zorder")._1 <= 32 && rows("linear")._1 <= 32)
    assert(rows("zorder")._2 <= rows("zorder")._1)
    assert(rows("zorder")._2 < rows("linear")._2,
      s"z-order should touch fewer files for the user query: $rows")
  }

  test("gap fill: each user's grid is dense from hour 0 and provenance " +
    "matches observation counts") {
    val rows = QueryRegistry.queries("w4_gap_fill")(spark, dir).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((_, rs) <- byUser) {
      val hours = rs.map(_.getAs[Long]("h")).sorted
      assert(hours.head == 0 && hours.last == hours.length - 1,
        "grid must be contiguous 0..maxh")
      assert(hours.distinct.length == hours.length)
      assert(rs.forall(r =>
        (r.getAs[String]("kind") == "obs") == (r.getAs[Long]("n_obs") > 0)))
    }
  }

  test("funnel stages are monotone non-increasing") {
    val rows = QueryRegistry.queries("w4_funnel")(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    assert(rows("1_view") > 0)
  }

  test("hybrid fusion: 10 unique ranks in descending rrf order and a doc " +
    "on both legs outranks single-leg docs with equal leg ranks") {
    val rows = QueryRegistry.queries("e2e_hybrid_search")(spark, dir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 10)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert((rrfs, rrfs.tail).zipped.forall(_ >= _))
    // every row is on at least one leg
    assert(rows.forall(r => r.getAs[Int]("r_bm25") > 0 || r.getAs[Int]("r_vec") > 0))
  }

  test("incremental dedup: planted cross-split duplicates are flagged " +
    "exact_dup and verdicts cover all branches") {
    val rows = QueryRegistry.queries("a10_incremental")(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val planted = byId.keys.filter(id => id % 25 == 0 && id > 0)
    assert(planted.nonEmpty)
    for (id <- planted)
      assert(byId(id) == "exact_dup", s"doc $id should be a planted exact dup")
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("exact_dup", "near_dup", "new"))
  }
}
