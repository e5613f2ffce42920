package graft

import graft.ops.CollectPipeline
import org.apache.spark.sql.functions._

/** Golden-record e2e for the /collect composition (SURVEY §5.4): the four
  * reference golden coordinates flow through; invalid requests are
  * rejected with the right error strings. */
class CollectPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def requests = Seq(
    ("req_la", 34.0522, -118.2437, 1000.0, Some("fire_2024-001")),
    ("req_yellowstone", 44.6, -110.5, 5000.0, None: Option[String]),
    ("req_london", 51.5074, -0.1278, 1000.0, None: Option[String]),
    ("req_bad_lat", 91.0, 10.0, 1000.0, None: Option[String]),
    ("req_bad_id", 36.5, -117.0, 1000.0, Some("x;y")),
    ("req_bad_buffer", 36.5, -117.0, 99.0, None: Option[String])
  ).toDF("request_id", "lat", "lon", "buffer_m", "event_id")

  test("validation rejects each failure mode with its reference error string") {
    val v = CollectPipeline.validate(requests)
    val errs = v.filter(!col("valid"))
      .select(col("request_id"), explode(col("errors")).as("e"))
      .as[(String, String)].collect().toSet
    assert(errs == Set(
      ("req_london", "outside supported US regions"),
      ("req_bad_lat", "invalid coordinates"),
      ("req_bad_id", "invalid event id"),
      ("req_bad_buffer", "buffer out of range")
    ))
  }

  test("aggregate is a single shuffle: exactly one Exchange, keyed on request_id") {
    val out = CollectPipeline.run(requests)
    out.collect()
    // AQE's toString repeats the plan under "== Initial Plan =="; count
    // exchanges only in the executed (final) section
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one request_id exchange, saw $exchanges:\n${plan.take(2000)}")
    assert(plan.contains("Exchange hashpartitioning(request_id"),
      s"exchange not keyed on request_id:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), s"pivot+summary should not join back:\n${plan.take(2000)}")
  }

  test("golden coordinates produce one wide row each with all four sources populated") {
    val out = CollectPipeline.run(requests)
    assert(out.count() == 2) // LA + Yellowstone survive
    val cols = Seq("landfire", "modis", "weather", "topography")
    assert(out.filter(cols.map(c => col(c).isNull).reduce(_ || _)).count() == 0)
    assert(out.filter(col("sources_successful") =!= 4).count() == 0)
    // deterministic: two runs agree exactly
    val a = out.orderBy("request_id").collect().toSeq
    val b = CollectPipeline.run(requests).orderBy("request_id").collect().toSeq
    assert(a == b)
  }

  test("observedRun: one log row per request; trace header wins; observe() census reaches the listener") {
    val withHeader = requests.withColumn("header_trace",
      when(col("request_id") === "req_la", lit("lb-trace-001")))

    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("graft_collect").foreach(r => observed = Some(r))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // no .orderBy here: a global sort's range-partitioning SAMPLING
      // pass would execute the observe() node a second time and
      // double-count the census — sort locally instead
      val env = CollectPipeline.observedRun(withHeader, headerCol = Some("header_trace"))
      val rows = env.collect().sortBy(_.getString(0))
      assert(rows.length == 6) // EVERY request logs exactly once, rejects included
      val byId = rows.map(r => r.getString(0) -> r).toMap
      // header propagation vs deterministic generation (orchestrator.py:73-87)
      assert(byId("req_la").getString(1) == "lb-trace-001")
      assert(byId("req_yellowstone").getString(1).matches("req_[0-9a-f]{12}"))
      assert(byId("req_london").getString(3) == "ERROR")
      assert(byId("req_london").getString(4) == "collect rejected: outside supported US regions")
      assert(byId("req_la").getString(3) == "INFO")
      // the observe() census arrives on the SAME job, no second pass
      // (listener delivery is async; poll briefly instead of touching
      // the private listener bus)
      val deadline = System.nanoTime() + 10000000000L
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(observed.isDefined, "observe() metrics never reached the listener")
      val m = observed.get
      assert(m.getLong(m.fieldIndex("n_requests")) == 6)
      assert(m.getLong(m.fieldIndex("n_valid")) == 2)
    } finally {
      spark.listenerManager.unregister(listener)
    }
  }
}
