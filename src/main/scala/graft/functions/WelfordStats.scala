package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.10 D4-class custom typed aggregation: single-pass
  * numerically-stable mean/variance (Welford, with Chan's parallel merge)
  * as an `Aggregator[Double, Buf, Out]`.
  *
  * Why custom: built-in avg+stddev_pop are two aggregates over two
  * accumulator sets; this computes count/mean/M2 in one buffer with the
  * merge law a distributed engine needs (`merge` is associative and
  * order-insensitive up to fp rounding — the property that makes the
  * result stable under any partitioning). The naive sum-of-squares form
  * catastrophically cancels at large counts with small variance — the
  * exact regime of 100 TB telemetry columns.
  */
case class WelfordBuf(n: Long, mean: Double, m2: Double)
case class WelfordOut(n: Long, mean: Double, variance_pop: Double, stddev_pop: Double)

object WelfordStats extends Aggregator[Double, WelfordBuf, WelfordOut] {
  type Buf = WelfordBuf
  type Out = WelfordOut
  private def Buf(n: Long, mean: Double, m2: Double) = WelfordBuf(n, mean, m2)
  private def Out(n: Long, mean: Double, v: Double, sd: Double) = WelfordOut(n, mean, v, sd)

  override def zero: Buf = Buf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    Buf(n, mean, b.m2 + delta * (x - mean))
  }

  /** Chan et al. parallel combine: exact for the statistic, stable for
    * unbalanced partition sizes. */
  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      Buf(n, mean, m2)
    }
  }

  override def finish(b: Buf): Out = {
    val v = if (b.n == 0) Double.NaN else b.m2 / b.n
    Out(b.n, b.mean, v, math.sqrt(v))
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}
