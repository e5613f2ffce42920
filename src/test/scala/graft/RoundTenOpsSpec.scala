package graft

import graft.ops.LabelProp
import graft.queries.{QueryRegistry, SelectionQueries}
import org.apache.spark.sql.functions._

/** Semantic (construction-independent) properties of the round-10
  * operators, beyond the oracle's hash match:
  *
  *  - the Pareto frontier is sound (no returned doc is dominated by ANY
  *    corpus doc) and complete (every non-returned doc is dominated by
  *    some returned doc) — checked against the raw metric table, not
  *    against the query's own census plumbing;
  *  - the rank-filter SQL face returns exactly the stock-window answer:
  *    the opt-in TopKPerKey rewrite may change the plan, never the rows;
  *  - label propagation's two exchange modes agree on RANDOM symmetric
  *    graphs (seeded, deterministic), not just the fixture and the
  *    hand-built cliques in LabelPropSpec.
  */
class RoundTenOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pareto frontier: sound and complete against the raw metric table") {
    val t = Tables(spark, dir)
    val metrics = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("t"),
        expr("CAST(size(array_distinct(w)) AS BIGINT) * 1000 div size(w)").as("q"))
      .as[(Long, Long, Long)].collect()
    val frontier = SelectionQueries.paretoFrontier.fn(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("uniq_pm"))
      .as[(Long, Long, Long)].collect()
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._3 >= b._3 && a._2 <= b._2 && (a._3 > b._3 || a._2 < b._2)
    // sound: nothing in the corpus dominates a frontier row
    for (f <- frontier)
      assert(!metrics.exists(m => dominates(m, f)), s"frontier row $f is dominated")
    // complete: every non-frontier doc is dominated by some frontier row
    val onFrontier = frontier.map(_._1).toSet
    for (m <- metrics if !onFrontier(m._1))
      assert(frontier.exists(f => dominates(f, m)), s"doc $m missing from frontier yet undominated")
    assert(frontier.nonEmpty)
  }

  test("sql_entry_topk: the rewritten plan returns exactly the stock-window rows") {
    val fn = QueryRegistry.queries("sql_entry_topk")
    val rewritten = fn(spark, dir).orderBy("user_id", "event_id").collect().toSeq
    // same SQL with the rewrite left OFF — stock WindowExec path
    Tables(spark, dir).events.createOrReplaceTempView("events")
    val stock = spark.sql("""
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id ASC) AS rn
        FROM events WHERE user_id < 50) t
      WHERE rn <= 3""").orderBy("user_id", "event_id").collect().toSeq
    assert(rewritten == stock)
    assert(stock.nonEmpty)
  }

  test("label propagation: broadcast == shuffle on random symmetric graphs (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(40)
      val raw = Seq.fill(4 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val edges = (raw ++ raw.map(_.swap)).distinct.toDF("src", "dst")
      val b = LabelProp.propagateBroadcast(edges, rounds = 3)
        .orderBy("node").collect().toSeq
      val sh = LabelProp.propagateShuffle(edges, rounds = 3)
        .orderBy("node").collect().toSeq
      assert(b == sh, s"trial $trial (n=$n): modes diverged")
      spark.catalog.clearCache()
    }
  }
}
