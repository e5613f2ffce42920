package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Observation API: per-pass data-quality counters collected as a side
  * effect of the main action — no second scan. At 100 TB a validation
  * pipeline cannot afford a separate count() per metric; observe()
  * attaches the metric aggregates to the one pass the job already does.
  */
class ObservationSpec extends SparkSpecBase {

  test("observe() collects validation metrics in the same pass as the write") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val obs = Observation("validation")
    val validated = t.events
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("value") < 0, 1)).as("n_negative"),
        count(when(col("props").isNull, 1)).as("n_null_props"),
        round(avg(col("value")), 4).as("avg_value"))
      .filter(col("value") >= 0)
    val kept = validated.count() // ONE action drives both result and metrics

    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] == t.events.count())
    assert(m("n_rows").asInstanceOf[Long] - m("n_negative").asInstanceOf[Long] == kept)
    assert(m("avg_value").asInstanceOf[Double] ==
      t.events.agg(round(avg(col("value")), 4)).head().getDouble(0))
  }
}
