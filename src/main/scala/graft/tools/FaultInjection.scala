package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Deterministic task-fault injection for retry-correctness proofs.
  *
  * SURVEY §4 maps the reference's retry/backoff TODO (README.md:228) to
  * Spark task retries "for free" — this helper is what turns that claim
  * into a measurement: a pass-through stage that fails exactly the
  * FIRST attempt of partition 0, so a query composed through it only
  * succeeds if the scheduler's task retry actually re-runs the lost
  * task, and its result can be hash-compared against the uninjected
  * run (RetryResilienceSpec, and graft.tools.RetryProbe under
  * local-cluster for the separate-JVM / executor-loss variants).
  *
  * `mapPartitions` is deliberate here — fault injection needs the
  * per-attempt TaskContext, which no Catalyst expression can observe;
  * this is test/probe plumbing, never a data-plan operator.
  */
object FaultInjection {

  /** Pass-through that throws on every attempt of partition 0 whose
    * attempt number is below `failAttemptsBelow`. With the value 1 the
    * first attempt dies and the retry succeeds; with a value >= the
    * scheduler's max task attempts the job must fail — the sanity leg
    * that proves the injector really fires. */
  def throwingBelowAttempt(df: DataFrame, failAttemptsBelow: Int,
                           message: String = "graft injected task failure"): DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() < failAttemptsBelow)
        throw new RuntimeException(s"$message (attempt ${tc.attemptNumber()})")
      it
    }(enc)
  }

  /** First attempt of partition 0 throws; the retry passes rows through
    * untouched. */
  def throwOnFirstAttempt(df: DataFrame): DataFrame =
    throwingBelowAttempt(df, failAttemptsBelow = 1)

  /** Pass-through that HALTS the executor JVM (exit 137, no shutdown
    * hooks) on the first attempt of partition 0 — the executor-loss
    * variant. Only meaningful under a multi-process master
    * (local-cluster / standalone), where the worker relaunches the
    * executor and the scheduler reruns the lost tasks; under in-process
    * masters it would kill the driver itself, so callers must gate on
    * the master URL. */
  def killExecutorOnFirstAttempt(df: DataFrame): DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        Runtime.getRuntime.halt(137)
      it
    }(enc)
  }
}
