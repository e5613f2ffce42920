package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §3.1 — the reference's primary entry point (`POST /collect`,
  * /root/reference/containers/orchestrator/orchestrator.py:634-808) as a
  * composable batch transform:
  *
  *   requests → validate (F1-F4) → per-source enrichment (fan-out) →
  *   union (U1) → pivot to wide rows (J1) → success summary (A6)
  *
  * The reference fans out over HTTP to four container processes; here the
  * fan-out is a union of four per-source column pipelines over the same
  * request scan — Spark parallelizes across partitions, and each source's
  * enrichment is row-local expression work (codegen'd, no UDFs, no
  * shuffles until the final pivot groupBy on request_id).
  *
  * Enrichment kernels are deterministic functions of the coordinates
  * standing in for the WAN fetches (the fetch itself is a source concern
  * — S1-S6 — outside the engine's semantics). Classification logic is
  * the reference's, transcribed: X9 fire-weather, X10 vegetation health,
  * X12 terrain, X14 range interpretation.
  *
  * Scale: one scan of requests, 4x row expansion, one shuffle on
  * request_id for the pivot. At 100 TB of requests the pivot keys are
  * unique per request, so the aggregate is a near-identity groupBy that
  * AQE sizes; nothing here is quadratic or driver-bound.
  */
object CollectPipeline {

  /** F1-F4 — accept/reject with accumulated error strings (X27).
    * The four predicates materialize once as boolean columns behind a
    * projection boundary (boundsOk is referenced twice in the error
    * array; inlining it would re-run the compound range checks). The
    * scratch columns are namespaced `__graft_*` so a caller column of
    * the same spelling is never clobbered and dropped. */
  def validate(requests: DataFrame): DataFrame = {
    val boundsOk = col("lat").between(-90, 90) && col("lon").between(-180, 180) &&
      !(col("lat") === 0 && col("lon") === 0)
    val usOk = (col("lat").between(24.5, 49.5) && col("lon").between(-125, -67)) ||
      (col("lat").between(54, 71.5) && (col("lon").between(-180, -130) || col("lon").between(170, 180))) ||
      (col("lat").between(18, 29) && col("lon").between(-178, -154))
    val bufferOk = col("buffer_m").between(100, 50000)
    val idOk = col("event_id").isNull ||
      (length(col("event_id")).between(3, 100) && col("event_id").rlike("^[a-zA-Z0-9_-]+$"))
    requests
      .withColumn("__graft_bounds_ok", boundsOk)
      .withColumn("__graft_us_ok", usOk)
      .withColumn("__graft_buffer_ok", bufferOk)
      .withColumn("__graft_id_ok", idOk)
      .withColumn("errors", filter(array(
        when(!col("__graft_bounds_ok"), "invalid coordinates"),
        when(col("__graft_bounds_ok") && !col("__graft_us_ok"), "outside supported US regions"),
        when(!col("__graft_buffer_ok"), "buffer out of range"),
        when(!col("__graft_id_ok"), "invalid event id")
      ), e => e.isNotNull))
      .withColumn("valid", size(col("errors")) === 0)
      .drop("__graft_bounds_ok", "__graft_us_ok", "__graft_buffer_ok", "__graft_id_ok")
  }

  /** Deterministic per-source "fetch" kernels — pure functions of the
    * coordinate, so results are reproducible (SURVEY §7: the engine takes
    * nondeterminism as parameters). */
  private def weatherTemp: Column = round(lit(15.0) + pmod(col("lat") * 7 + col("lon") * 3, lit(20)), 2)
  private def weatherHumidity: Column = pmod(floor(col("lat") * 11 + col("lon") * 5), lit(80)).cast("int") + 10
  private def weatherWind: Column = round(pmod(col("lon") * 13, lit(18)), 2)
  private def ndviRaw: Column = pmod(floor(col("lat") * 100 + col("lon") * 50), lit(9000)).cast("int")
  private def pixelCode: Column = (pmod(floor(col("lat") * 37 + col("lon") * 17), lit(10)) * lit(1000) + 2500).cast("int")
  private def elevRange: Column = round(pmod(col("lat") * 19 - col("lon") * 7, lit(150)), 2)

  /** One tall record per (request × source): source, a numeric value, a
    * risk classification — the §2 classify chains applied per source.
    *
    * The 4-way fan-out is an explode over an array of per-source
    * structs, NOT a union of four selects: a union re-scans the request
    * relation once per source (Catalyst reuses exchanges, not scans),
    * while the explode is genuinely one scan + a row-local 4× expansion.
    *
    * @param carry extra request columns to thread through the fan-out —
    *              callers that need per-request metadata downstream
    *              (e.g. the §3.3 routing columns) carry it here instead
    *              of joining it back on request_id afterwards. */
  def enrich(valid: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("request_id") ++ carry).map(col)
    // Kernels materialize ONCE per request behind projection boundaries
    // (CollapseProject keeps non-cheap expressions un-inlined), then the
    // risk chains reference them as plain attributes. Inlining the
    // kernel trees into every when-branch of every struct multiplies
    // the per-row arithmetic ~10x — measured ~20 micros/row at 100k
    // requests, the difference between 0.3 s and 3 s per pass.
    val kernels = valid.select(keep ++ Seq(
      weatherTemp.as("w_temp"), weatherHumidity.as("w_hum"), weatherWind.as("w_wind"),
      (ndviRaw * 0.0001).as("ndvi"), pixelCode.as("pixel"), elevRange.as("elev")): _*)
    val scored = kernels.withColumn("w_score",
      when(col("w_temp") > 30, 3).when(col("w_temp") > 25, 2).when(col("w_temp") > 20, 1).otherwise(0) +
        when(col("w_hum") < 20, 3).when(col("w_hum") < 40, 2).when(col("w_hum") < 60, 1).otherwise(0) +
        when(col("w_wind") > 15, 3).when(col("w_wind") > 10, 2).when(col("w_wind") > 5, 1).otherwise(0))
    val weatherRisk =
      when(col("w_score") >= 7, "EXTREME").when(col("w_score") >= 5, "HIGH")
        .when(col("w_score") >= 3, "MODERATE").otherwise("LOW")
    val modisRisk =
      when(col("ndvi") > 0.6, "LOW")
        .when(col("ndvi") > 0.3, "MODERATE")
        .when(col("ndvi") > 0.1, "HIGH")
        .otherwise("EXTREME")
    val landfireRisk =
      when(col("pixel") >= 7000 && col("pixel") < 8000, "LOW")           // Urban/Developed
        .when(col("pixel") >= 3000 && col("pixel") < 4000, "MODERATE_TO_HIGH") // Forest fuels
        .when(col("pixel") >= 2000 && col("pixel") < 3000, "MODERATE_TO_HIGH") // Grassland
        .otherwise("MODERATE")
    val topoRisk =
      when(col("elev") > 100, "HIGH").when(col("elev") > 50, "MODERATE").otherwise("LOW")

    scored
      .select(keep :+ explode(array(
        struct(lit("weather").as("source"), col("w_temp").as("value"), weatherRisk.as("risk")),
        struct(lit("modis").as("source"), round(col("ndvi"), 4).as("value"), modisRisk.as("risk")),
        struct(lit("landfire").as("source"), col("pixel").cast("double").as("value"), landfireRisk.as("risk")),
        struct(lit("topography").as("source"), col("elev").as("value"), topoRisk.as("risk")))).as("e"): _*)
      .select(keep ++ Seq(col("e.source").as("source"),
        col("e.value").as("value"), col("e.risk").as("risk")): _*)
  }

  /** The risk label domain, ordered; shared by the integer-coded pivot
    * below and EventStreamPipeline's event-keyed variant. A risk STRING
    * in the aggregation buffer forces SortAggregate (var-length buffer
    * fields are not hash-aggregable), which sorts the whole 4x tall
    * fan-out twice (partial + final, measured as the two SortAggregates
    * in plans/r12/t6_event_collect_before.txt) — so the pivot aggregates
    * the integer CODE (HashAggregate, whole-stage codegen) and decodes
    * back to the label after the exchange. Each (request, source)
    * appears at most once in the tall frame, so max == first. */
  val riskLabels: Seq[String] =
    Seq("LOW", "MODERATE", "MODERATE_TO_HIGH", "HIGH", "EXTREME")

  def riskCode(risk: Column): Column =
    riskLabels.zipWithIndex.foldLeft(lit(null).cast("int")) { case (acc, (l, i)) =>
      when(risk === l, i + 1).otherwise(acc)
    }

  def riskDecode(code: Column): Column =
    riskLabels.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (l, i)) =>
      when(code === (i + 1), l).otherwise(acc)
    }

  /** J1 + A6 — pivot the tall records into one wide row per request with
    * the success summary, in ONE aggregate: the explicit-value pivot is a
    * conditional max per source over the integer risk code (exactly what
    * Pivot lowers to, kept hash-aggregable — see [[riskCode]]), and
    * the summary counts ride the same groupBy — one Exchange on
    * request_id, no second aggregate + join back. */
  def aggregate(tall: DataFrame): DataFrame =
    tall
      .withColumn("risk_c", riskCode(col("risk")))
      .groupBy(col("request_id"))
      .agg(
        max(when(col("source") === "landfire", col("risk_c"))).as("landfire_c"),
        max(when(col("source") === "modis", col("risk_c"))).as("modis_c"),
        max(when(col("source") === "weather", col("risk_c"))).as("weather_c"),
        max(when(col("source") === "topography", col("risk_c"))).as("topography_c"),
        count(lit(1)).as("sources_successful"),
        count(when(col("risk").isin("HIGH", "EXTREME"), 1)).as("n_high_risk"))
      .select(col("request_id"),
        riskDecode(col("landfire_c")).as("landfire"),
        riskDecode(col("modis_c")).as("modis"),
        riskDecode(col("weather_c")).as("weather"),
        riskDecode(col("topography_c")).as("topography"),
        col("sources_successful"), col("n_high_risk"))

  /** The full /collect shape. */
  def run(requests: DataFrame): DataFrame = {
    val v = validate(requests)
    aggregate(enrich(v.filter(col("valid")))) // rejected rows carry `errors`
  }

  /** Trace-id propagation (orchestrator.py:73-87): the caller-supplied
    * infrastructure header when present (the x-request-id /
    * x-trace-id path), else a generated `req_<hex12>` — here a
    * DETERMINISTIC md5 surrogate of the request key instead of the
    * reference's uuid4, the same take-nondeterminism-as-a-parameter
    * policy as X22, so the envelope is oracle-able. */
  def traceId(keyCol: String, headerCol: Option[String]): Column = {
    val generated = concat(lit("req_"), substring(md5(col(keyCol)), 1, 12))
    headerCol.map(h => coalesce(col(h), generated)).getOrElse(generated)
  }

  /** The observability envelope (orchestrator.py:33-87): run /collect and
    * emit ONE STRUCTURED-LOG RECORD PER REQUEST — trace id, level,
    * message (rejects carry the X27-formatted error list), error count,
    * and the per-request success metrics. The returned frame also
    * carries a real Spark `observe()` aggregate
    * (n_requests / n_valid / n_high_risk_total), so a
    * QueryExecutionListener receives the run-level census from the SAME
    * job that computes the rows — the engine-native form of the
    * reference's log aggregation, with no second pass over the data
    * (proven in CollectPipelineSpec). */
  def observedRun(requests: DataFrame, keyCol: String = "request_id",
                  headerCol: Option[String] = None): DataFrame = {
    val v = validate(requests.withColumn("trace_id", traceId(keyCol, headerCol)))
    val agg = aggregate(enrich(v.filter(col("valid"))))
    v.join(agg, Seq("request_id"), "left")
      .select(
        col("request_id"),
        col("trace_id"),
        lit("orchestrator").as("service"),
        when(col("valid"), lit("INFO")).otherwise(lit("ERROR")).as("level"),
        when(col("valid"), lit("collect completed"))
          .otherwise(concat(lit("collect rejected: "),
            concat_ws("; ", col("errors")))).as("message"),
        size(col("errors")).cast("long").as("n_errors"),
        coalesce(col("sources_successful"), lit(0L)).as("sources_successful"),
        coalesce(col("n_high_risk"), lit(0L)).as("n_high_risk"))
      .observe("graft_collect",
        count(lit(1)).as("n_requests"),
        sum(when(col("level") === "INFO", 1L).otherwise(0L)).as("n_valid"),
        sum(col("n_high_risk")).as("n_high_risk_total"))
  }
}
