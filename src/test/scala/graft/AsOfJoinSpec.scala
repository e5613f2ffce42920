package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Edge semantics of the backward as-of join (ops/AsOfJoin): equal-instant
  * match, no-prior-build nulls, key isolation, and equivalence to the
  * naive O(n·m) range-join + argmax formulation on the fixture tables. */
class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(probe: Seq[(Int, Long, Double)], build: Seq[(Int, Long, String)]) = {
    val p = probe.toDF("k", "t", "v")
    val b = build.toDF("k", "t", "tag")
    AsOfJoin.leftBackward(p, b, keys = Seq("k"), tsCol = "t", buildPayload = Seq("tag"))
      .select("k", "t", "v", "asof_tag", "asof_ts")
      .collect().toSet
  }

  test("backward match picks the newest at-or-before build row per key") {
    val got = run(
      probe = Seq((1, 10L, 1.0), (1, 25L, 2.0), (2, 7L, 3.0)),
      build = Seq((1, 5L, "a"), (1, 20L, "b"), (2, 100L, "z")))
    assert(got === Set(
      Row(1, 10L, 1.0, "a", 5L),   // 5 <= 10 < 20
      Row(1, 25L, 2.0, "b", 20L),  // newest at-or-before 25
      Row(2, 7L, 3.0, null, null)  // key 2's only build row is later
    ))
  }

  test("equal timestamps match (ASOF >= semantics) and keys don't leak") {
    val got = run(
      probe = Seq((1, 20L, 1.0), (2, 20L, 2.0)),
      build = Seq((1, 20L, "same-instant"), (2, 3L, "old")))
    assert(got === Set(
      Row(1, 20L, 1.0, "same-instant", 20L),
      Row(2, 20L, 2.0, "old", 3L)))
  }

  test("probe with no build rows at all keeps every row, all-null as-of") {
    val got = run(probe = Seq((9, 1L, 4.2)), build = Seq.empty)
    assert(got === Set(Row(9, 1L, 4.2, null, null)))
  }

  test("forward direction picks the earliest at-or-after build row") {
    val p = Seq((1, 10L, 1.0), (1, 25L, 2.0), (2, 7L, 3.0)).toDF("k", "t", "v")
    val b = Seq((1, 5L, "a"), (1, 20L, "b"), (2, 3L, "z")).toDF("k", "t", "tag")
    val got = AsOfJoin.leftForward(p, b, Seq("k"), "t", Seq("tag"))
      .select("k", "t", "v", "asof_tag", "asof_ts").collect().toSet
    assert(got === Set(
      Row(1, 10L, 1.0, "b", 20L),  // earliest at-or-after 10 is 20
      Row(1, 25L, 2.0, null, null), // nothing after 25
      Row(2, 7L, 3.0, null, null))) // key 2's only build is before
  }

  test("tolerance nulls out matches outside the window, keeps rows") {
    val p = Seq((1, 100L, 1.0), (1, 200L, 2.0)).toDF("k", "t", "v")
    val b = Seq((1, 95L, "near"), (1, 120L, "x")).toDF("k", "t", "tag")
    val got = AsOfJoin.leftBackward(p, b, Seq("k"), "t", Seq("tag"),
        tolerance = Some(lit(10L)))
      .select("k", "t", "v", "asof_tag", "asof_ts").collect().toSet
    assert(got === Set(
      Row(1, 100L, 1.0, "near", 95L),  // 95 within [90, 100]
      Row(1, 200L, 2.0, null, null))) // nearest (120) is 80 behind — stale
  }

  test("matches the naive range-join + argmax formulation on fixture data") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val probe = t.events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
    val build = t.events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("signup_value"))

    val fast = AsOfJoin.leftBackward(probe, build,
        keys = Seq("user_id"), tsCol = "ts", buildPayload = Seq("signup_value"))
      .select("user_id", "event_id", "asof_signup_value", "asof_ts")
      .collect().toSet

    // Naive reference: non-equi join then argmax by build ts — quadratic
    // per key, fine at fixture scale, unusable at 100 TB (why AsOfJoin
    // exists).
    val naive = probe.as("p")
      .join(build.as("b"),
        col("p.user_id") === col("b.user_id") && col("p.ts") >= col("b.ts"), "left")
      .groupBy(col("p.user_id").as("user_id"), col("p.event_id").as("event_id"))
      .agg(
        max_by(col("b.signup_value"), col("b.ts")).as("asof_signup_value"),
        max(col("b.ts")).as("asof_ts"))
      .collect().toSet

    assert(fast === naive)
  }
}
