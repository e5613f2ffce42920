package graft

import graft.functions.WelfordStats
import org.apache.spark.sql.functions._

/** The custom typed aggregator must agree with the built-ins on real
  * data, be partition-order insensitive, and survive the cancellation
  * regime that breaks naive sum-of-squares. */
class WelfordStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("matches built-in avg/stddev_pop on the events table under any partitioning") {
    val values = Tables(spark, "/root/testdata/sf0.001").events.select(col("value"))
    val builtin = values.agg(avg("value"), stddev_pop("value")).as[(Double, Double)].head()
    for (parts <- Seq(1, 7, 32)) {
      val w = values.repartition(parts).as[Double] // Dataset[Double] via implicit row->double
        .select(udaf(WelfordStats).apply(col("value")).as("w"))
        .select("w.mean", "w.stddev_pop").as[(Double, Double)].head()
      assert(math.abs(w._1 - builtin._1) < 1e-9)
      assert(math.abs(w._2 - builtin._2) < 1e-9)
    }
  }

  test("stays stable where naive sum-of-squares cancels (huge offset, tiny variance)") {
    val base = 1e9
    val xs = (1 to 100000).map(i => base + (i % 3) - 1.0) // values base+{-1,0,1}
    // exact: 0 appears 33334x, +/-1 appear 33333x each -> var = 66666/100000
    val exact = 66666.0 / 100000.0
    val w = xs.toDF("x").select(udaf(WelfordStats).apply(col("x")).as("w"))
      .select("w.variance_pop").as[Double].head()
    assert(math.abs(w - exact) < 1e-6)
    // the naive form at this scale: E[x^2]-E[x]^2 with doubles loses most digits;
    // assert our error is orders of magnitude below one ulp of base^2 (~131072)
  }

  test("empty input finishes to NaN, merge with empty buffer is identity") {
    val out = WelfordStats.finish(WelfordStats.zero)
    assert(out.n == 0 && out.variance_pop.isNaN)
    val b = WelfordStats.reduce(WelfordStats.zero, 5.0)
    assert(WelfordStats.merge(WelfordStats.zero, b) == b)
    assert(WelfordStats.merge(b, WelfordStats.zero) == b)
  }
}
