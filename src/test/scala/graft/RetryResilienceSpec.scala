package graft

import graft.tools.FaultInjection
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-level task-retry correctness (VERDICT r10 next #2): SURVEY §4
  * claims the reference's retry/backoff TODO comes "for free" from
  * Spark task retries — this spec replaces the claim with a measurement.
  * A representative shuffle query runs with a deterministic FIRST-ATTEMPT
  * task failure injected between scan and aggregate; under max 2 task
  * attempts the job must succeed via the scheduler's retry and the
  * result must be bit-identical to the uninjected run. The sanity leg
  * exhausts the attempt budget and must fail with the injected message —
  * proving the injector really fires and the retry is what saved the
  * first leg. (The separate-JVM / executor-kill variant runs under
  * local-cluster via graft.tools.RetryProbe — see SCALE.md.)
  */
class RetryResilienceSpec extends SparkSpecBase {

  private def scan(): DataFrame =
    Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))

  private def agg(df: DataFrame): Array[String] =
    df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().map(_.toString)

  test("a first-attempt task failure is retried and the result is bit-identical") {
    assert(spark.sparkContext.master == "local[4,2]",
      "precondition: the shared session must allow a second task attempt")
    val clean = agg(scan())
    val viaRetry = agg(FaultInjection.throwOnFirstAttempt(scan()))
    assert(viaRetry.sameElements(clean),
      s"retried run diverged:\nclean=${clean.mkString("|")}\nretry=${viaRetry.mkString("|")}")
  }

  test("sanity: exhausting the attempt budget fails with the injected error") {
    // failAttemptsBelow=2 kills attempts 0 and 1; local[4,2] allows only
    // 2 attempts, so the job must fail — proof the injector fires at all
    val e = intercept[Exception] {
      agg(FaultInjection.throwingBelowAttempt(scan(), failAttemptsBelow = 2))
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("graft injected task failure")),
      s"unexpected failure: ${e.getMessage}")
  }
}
