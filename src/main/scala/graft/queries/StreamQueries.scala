package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 T1–T5 — batch-verifiable projections of the streaming
  * path. The actual Structured Streaming runtime (readStream → watermark
  * → windowed agg → foreachBatch sink) lives in
  * [[graft.streaming.EventStreamPipeline]] and is exercised by
  * EventStreamSpec, which asserts the streamed result equals the batch
  * plan on the same data (Structured Streaming guarantees this for
  * append-complete inputs). The queries here pin the routing and sink
  * SEMANTICS against the DuckDB oracle.
  */
object StreamQueries {

  /** T2 — priority routing (orchestrator.py:924-935): emergency → all 4
    * sources / 60 s budget; created → all 4 / 120 s; anything else →
    * weather only / 30 s. */
  val t2 = Q(
    "t2_priority_route",
    "Priority-based routing when-chain producing the sources set + timeout budget per event.",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, "emergency", "updated"), (2, "normal", "created"), (3, "low", "updated"),
        (4, "high", "location_changed"), (5, "emergency", "created"), (6, "normal", "updated")
      ).toDF("id", "priority", "event_type")
        .withColumn("sources",
          when(col("priority") === "emergency" || col("event_type") === "created",
            lit("landfire,modis,weather,topography")).otherwise(lit("weather")))
        .withColumn("timeout_s",
          when(col("priority") === "emergency", 60)
            .when(col("event_type") === "created", 120)
            .otherwise(30))
    },
    Some("""SELECT id, priority, event_type,
            CASE WHEN priority = 'emergency' OR event_type = 'created'
                 THEN 'landfire,modis,weather,topography' ELSE 'weather' END AS sources,
            CASE WHEN priority = 'emergency' THEN 60
                 WHEN event_type = 'created' THEN 120 ELSE 30 END AS timeout_s
            FROM (VALUES (1, 'emergency', 'updated'), (2, 'normal', 'created'), (3, 'low', 'updated'),
                         (4, 'high', 'location_changed'), (5, 'emergency', 'created'), (6, 'normal', 'updated'))
                 AS t(id, priority, event_type)""")
  )

  /** T3 — the event-keyed results sink the reference stubs out
    * (orchestrator.py:960-986, TODO at :978-981): per event, the routed
    * collection request materialized as a sink row. Batch shape of the
    * foreachBatch write in EventStreamPipeline. */
  val t3 = Q(
    "t3_event_sink",
    "Event-keyed sink rows: route each event, emit (event_id, sources, requested_at) — the persistence the reference leaves as TODO.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .filter(col("event_type").isin("signup", "purchase")) // "created"-like triggers
        .select(
          col("event_id"),
          col("user_id"),
          when(col("event_type") === "signup", lit("landfire,modis,weather,topography"))
            .otherwise(lit("weather")).as("sources"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("requested_at")
        )
    },
    Some("""SELECT event_id, user_id,
            CASE WHEN event_type = 'signup' THEN 'landfire,modis,weather,topography'
                 ELSE 'weather' END AS sources,
            strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS requested_at
            FROM events WHERE event_type IN ('signup', 'purchase')""")
  )

  /** T4 — health-tick summary: the 30 s health poll as a batch roll-up
    * over per-minute buckets (rate/availability per source). */
  val t4 = Q(
    "t4_health_ticks",
    "Health-poll roll-up: per-hour bucket per type, event rate and error share — the batch form of the Trigger.ProcessingTime status stream.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(date_trunc("hour", col("ts")).as("tick"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(count(when(col("value") > 100, 1)).cast("double") / count(lit(1)), 6).as("hi_share"))
    },
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS tick, event_type, count(*) AS n,
            round(CAST(count(CASE WHEN value > 100 THEN 1 END) AS DOUBLE) / count(*), 6) AS hi_share
            FROM events GROUP BY 1, 2""")
  )

  def all: Seq[Q] = Seq(t2, t3, t4)
}
